from ns2vc_tpu.ops.masking import sequence_mask, mask_to_bias
from ns2vc_tpu.ops.attention import multihead_attention

__all__ = ["sequence_mask", "mask_to_bias", "multihead_attention"]
