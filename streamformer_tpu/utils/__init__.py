from streamformer_tpu.utils import profiling
