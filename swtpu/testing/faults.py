"""Seeded fault injection for the hardware-free test harness.

Models PSLSE's randomized adversarial backend (pslse-master/pslse/
pslse.parms: SEED, PAGED_PERCENT, REORDER_PERCENT, BUFFER_PERCENT;
parms.c:27-55 coin-flips): batch submissions can be reordered, transiently
dropped (forcing a retry, like PAGED responses force DMA retry), and
delayed.  Everything is driven by one seed so failures reproduce.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class FaultConfig:
    """pslse.parms equivalent.  Percentages in [0, 100]."""

    seed: int = 1234
    reorder_percent: int = 0  # shuffle batch submission order
    drop_percent: int = 0  # transiently fail a batch (retried)
    max_retries: int = 5
    delay_ms_min: int = 0
    delay_ms_max: int = 0


class TransientFault(RuntimeError):
    pass


class FaultInjector:
    """Wraps a batch scorer fn(q, t) -> scores with seeded adversity."""

    def __init__(self, config: FaultConfig):
        self.config = config
        self.rng = np.random.default_rng(config.seed)
        self.injected_drops = 0
        self.injected_reorders = 0

    def order(self, n_batches: int) -> List[int]:
        order = list(range(n_batches))
        if self.rng.integers(100) < self.config.reorder_percent:
            self.rng.shuffle(order)
            if order != sorted(order):
                self.injected_reorders += 1
        return order

    def submit(self, fn: Callable, *args):
        cfg = self.config
        if cfg.delay_ms_max > 0:
            delay = self.rng.integers(cfg.delay_ms_min, cfg.delay_ms_max + 1)
            time.sleep(delay / 1e3)
        for attempt in range(cfg.max_retries + 1):
            if attempt < cfg.max_retries and self.rng.integers(100) < cfg.drop_percent:
                self.injected_drops += 1
                continue  # simulate a dropped submission; retry
            return fn(*args)
        raise TransientFault("exceeded max retries")


def score_database_with_faults(
    bank,
    query: np.ndarray,
    targets: Sequence[np.ndarray],
    faults: FaultConfig,
):
    """ScoreBank.score_database with adversarial batch scheduling: batches
    run in a fault-injected order with transient drops/retries; results must
    still land in read order (the ID-FIFO pairing guarantee,
    ScoreBank/SM_Feeder2.v:66-96)."""
    from swtpu.bank.packer import pack_many_vs_one

    inj = FaultInjector(faults)
    batches = pack_many_vs_one(
        query, targets, bucket_lens=bank.config.target_buckets
    )
    scores = np.zeros((len(targets),), dtype=np.int32)
    for bi in inj.order(len(batches)):
        batch = batches[bi]
        s = inj.submit(bank._score_batch, batch.q, batch.t)
        live = batch.ids >= 0
        scores[batch.ids[live]] = s[live]
    return scores, inj
