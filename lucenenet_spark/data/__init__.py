from .pages import BLAKE_DOCS, synth_pages_pandas, write_pages_parquet

__all__ = ["BLAKE_DOCS", "synth_pages_pandas", "write_pages_parquet"]
