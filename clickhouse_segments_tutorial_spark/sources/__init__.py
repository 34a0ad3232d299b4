from .bucketed import (
    compact_bucketed,
    heal_bucketed_from_pins,
    newest_valid_pin,
    read_table,
    resolve_wave_counter,
    state_table_prefix,
    write_bucketed,
)
from .catalog import Catalog, load_table
from .database import SegmentDatabase
from .json_ingest import read_json_rows

__all__ = [
    "Catalog",
    "SegmentDatabase",
    "compact_bucketed",
    "heal_bucketed_from_pins",
    "load_table",
    "newest_valid_pin",
    "read_json_rows",
    "read_table",
    "resolve_wave_counter",
    "state_table_prefix",
    "write_bucketed",
]
