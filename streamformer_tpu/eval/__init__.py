from streamformer_tpu.eval import metrics
