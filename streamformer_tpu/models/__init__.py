from streamformer_tpu.models import encoder
