from streamformer_tpu.train import optim, metrics
