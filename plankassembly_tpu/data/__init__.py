from plankassembly_tpu.data.line_data import LineDataset
from plankassembly_tpu.data.sideface_data import SidefaceDataset
from plankassembly_tpu.data.loader import DataLoader, parse_splits_list

__all__ = ["LineDataset", "SidefaceDataset", "DataLoader", "parse_splits_list"]
