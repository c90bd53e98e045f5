from streamformer_tpu.ops import attention
