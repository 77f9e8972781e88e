from swtpu.ops.common import Q_PAD, T_PAD, pad_to_static, sentinel_pad_batch
from swtpu.ops.scan import sw_scores_scan

__all__ = [
    "Q_PAD",
    "T_PAD",
    "pad_to_static",
    "sentinel_pad_batch",
    "sw_scores_scan",
]
