from .config import IndexConfig
from .build import build_index
from .manifest import Manifest, load_manifest
from .dv_updates import (
    SOFT_DELETES_FIELD,
    soft_delete_by_query,
    soft_undelete,
    update_numeric_docvalues,
    update_numeric_docvalues_by_query,
)

__all__ = [
    "IndexConfig",
    "build_index",
    "Manifest",
    "load_manifest",
    "SOFT_DELETES_FIELD",
    "soft_delete_by_query",
    "soft_undelete",
    "update_numeric_docvalues",
    "update_numeric_docvalues_by_query",
]
