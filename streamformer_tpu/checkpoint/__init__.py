from streamformer_tpu.checkpoint.hf_import import (
    convert_backbone_state_dict,
    from_pretrained,
)
