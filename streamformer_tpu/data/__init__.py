from streamformer_tpu.data import samplers, transforms
