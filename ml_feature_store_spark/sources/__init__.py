from .registry import MemoryVersionStore, ParquetVersionStore
from .testdata import load_table, load_tables

__all__ = ["MemoryVersionStore", "ParquetVersionStore", "load_table", "load_tables"]
