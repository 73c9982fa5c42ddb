from ns2vc_tpu.features.contentvec import (
    ContentVec,
    convert_fairseq_hubert,
    load_contentvec,
)

__all__ = ["ContentVec", "convert_fairseq_hubert", "load_contentvec"]
