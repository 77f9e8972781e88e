from swtpu.testing.goldens import (
    REFERENCE_DATA_DIR,
    parse_rtl_out_file,
    parse_ssearch_scores,
    reference_data_available,
)

__all__ = [
    "REFERENCE_DATA_DIR",
    "parse_rtl_out_file",
    "parse_ssearch_scores",
    "reference_data_available",
]
