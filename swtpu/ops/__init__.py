from swtpu.ops.common import Q_PAD, T_PAD, pad_to_static, sentinel_pad_batch
from swtpu.ops.scan import sw_scores_scan

__all__ = [
    "Q_PAD",
    "T_PAD",
    "pad_to_static",
    "sentinel_pad_batch",
    "sw_scores_scan",
    "sw_scores_pallas",
    "sw_scores_pallas_lane",
    "sw_scores_stream_strip",
]


def __getattr__(name):
    # pallas kernels import lazily so CPU-only use never touches pallas
    if name == "sw_scores_pallas":
        from swtpu.ops.pallas_kernel import sw_scores_pallas

        return sw_scores_pallas
    if name == "sw_scores_pallas_lane":
        from swtpu.ops.pallas_lane import sw_scores_pallas_lane

        return sw_scores_pallas_lane
    if name == "sw_scores_stream_strip":
        from swtpu.ops.pallas_stream import sw_scores_stream_strip

        return sw_scores_stream_strip
    raise AttributeError(name)
