from ns2vc_tpu.infer.serve import MicroBatcher
from ns2vc_tpu.infer.svc import Svc, RealTimeVC

__all__ = ["Svc", "RealTimeVC", "MicroBatcher"]
