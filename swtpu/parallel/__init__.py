from swtpu.parallel.mesh import make_mesh
from swtpu.parallel.sharded import (
    make_sharded_scorer,
    make_sharded_stream_scorer,
    make_sharded_topk,
)

__all__ = [
    "make_mesh",
    "make_sharded_scorer",
    "make_sharded_stream_scorer",
    "make_sharded_topk",
]
