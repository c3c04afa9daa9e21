from .config import IndexConfig
from .build import build_index
from .manifest import Manifest, load_manifest

__all__ = ["IndexConfig", "build_index", "Manifest", "load_manifest"]
