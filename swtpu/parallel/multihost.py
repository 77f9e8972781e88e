"""Multi-host deployment API.

Production-facing wrapper over `jax.distributed` for running the ScoreBank
across hosts: each process owns a database shard; queries are replicated;
scores and top-K merge over DCN/ICI collectives.  The hardware-free
equivalent (N OS processes on localhost, CPU backend) lives in
swtpu.testing.{worker,regress} — same code path, per the reference's PSLSE
strategy of exercising the full stack without hardware (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, with args optional when the environment
    provides them (GKE/TPU pods auto-discover)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def shard_rows(local_rows: np.ndarray, mesh, axis: str = "data"):
    """Build a globally-sharded array from this process's rows (the host's
    database shard -> its devices' slice of the global batch)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (local_rows.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_rows
    )


def score_database_multihost(
    query: np.ndarray,
    local_targets: Sequence[np.ndarray],
    local_ids: np.ndarray,
    mesh=None,
    k: int = 10,
    backend: str = "auto",
    penalties=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score this host's shard within the global job.

    Returns (top_scores [k], top_ids [k], local_scores) where the top-K is
    globally merged and replicated on every host (the bank-wide best-hit
    capability, ScoreBank/ScoreBank_v2.v:42-43).

    All hosts must call this collectively with equal per-host batch shapes
    (pad with sentinel rows, id -1).
    """
    import jax

    from swtpu.config import DEFAULT_PENALTIES
    from swtpu.ops.common import Q_PAD, T_PAD
    from swtpu.parallel.mesh import make_mesh
    from swtpu.parallel.sharded import make_sharded_topk

    pen = penalties or DEFAULT_PENALTIES
    if mesh is None:
        mesh = make_mesh()
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"

    B = len(local_targets)
    n_max = max((len(t) for t in local_targets), default=1)
    qw = max(8, -(-len(query) // 8) * 8)
    tw = max(8, -(-n_max // 8) * 8)
    q = np.full((B, qw), Q_PAD, np.int8)
    q[:, : len(query)] = np.asarray(query, np.int8)[None, :]
    t = np.full((B, tw), T_PAD, np.int8)
    for i, tt in enumerate(local_targets):
        t[i, : len(tt)] = tt

    qg = shard_rows(q, mesh)
    tg = shard_rows(t, mesh)
    idsg = shard_rows(np.asarray(local_ids, np.int32), mesh)
    topk = make_sharded_topk(mesh, k=k, backend=backend, penalties=pen)
    top_s, top_ids, scores = topk(qg, tg, idsg)
    local_scores = np.concatenate(
        [np.asarray(s.data) for s in scores.addressable_shards]
    )
    return np.asarray(top_s), np.asarray(top_ids), local_scores
