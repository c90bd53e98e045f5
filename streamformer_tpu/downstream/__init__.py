from streamformer_tpu.downstream import ar
