from .bucketed import read_table, write_bucketed
from .catalog import Catalog, load_table
from .database import SegmentDatabase
from .json_ingest import read_json_rows

__all__ = [
    "Catalog",
    "SegmentDatabase",
    "load_table",
    "read_json_rows",
    "read_table",
    "write_bucketed",
]
