from streamformer_tpu.parallel.mesh import make_mesh
from streamformer_tpu.parallel.contrastive import (
    sigmoid_pair_loss,
    siglip_local_loss,
    siglip_ring_loss,
)
