from swtpu.io.fasta import FastaRecord, read_fasta, read_query_and_db, write_fasta
from swtpu.io.encode import (
    BASE_CODES,
    CODE_BASES,
    encode_seq,
    decode_seq,
    encode_batch,
    pack_2bit,
    unpack_2bit,
)

__all__ = [
    "FastaRecord",
    "read_fasta",
    "read_query_and_db",
    "write_fasta",
    "BASE_CODES",
    "CODE_BASES",
    "encode_seq",
    "decode_seq",
    "encode_batch",
    "pack_2bit",
    "unpack_2bit",
]
