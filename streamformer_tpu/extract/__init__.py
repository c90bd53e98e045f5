from streamformer_tpu.extract import oad
