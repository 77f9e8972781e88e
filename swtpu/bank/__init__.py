from swtpu.bank.buckets import BucketPlan, plan_buckets
from swtpu.bank.packer import PackedBatch, pack_pairs, pack_many_vs_one
from swtpu.bank.scorebank import LoadedDatabase, ScoreBank, ScoreResult
from swtpu.bank.serving import ShardedLoadedDatabase

__all__ = [
    "BucketPlan",
    "plan_buckets",
    "PackedBatch",
    "pack_pairs",
    "pack_many_vs_one",
    "LoadedDatabase",
    "ShardedLoadedDatabase",
    "ScoreBank",
    "ScoreResult",
]
