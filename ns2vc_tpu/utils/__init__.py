from ns2vc_tpu.utils.wavio import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
