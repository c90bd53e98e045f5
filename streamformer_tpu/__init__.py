"""StreamFormer-TPU: a TPU-native streaming video representation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
StreamFormer (Go2Heart/StreamFormer): causal streaming TimeSformer-SigLIP
video encoder, multitask training (global/temporal/spatial heads), streaming
KV-cache inference, on-device video preprocessing, and downstream suites.
"""

from streamformer_tpu.config import StreamformerConfig

__version__ = "0.1.0"
__all__ = ["StreamformerConfig"]
