"""DatasetBundle: what a dataset util's preprocess() hands the driver —
splits of host-side graph dicts plus encoder factories and metric metadata
(the tuple contract of /root/reference/dataset/*.py preprocess functions)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional


@dataclasses.dataclass
class DatasetBundle:
    splits: Dict[str, List[dict]]  # train / valid / test graph dicts
    num_tasks: int
    node_encoder_cls: Callable[[], Any]  # () -> flax module
    edge_encoder_cls: Callable[[int], Any]  # emb_dim -> flax module
    deg: Optional[Any]  # degree histogram (numpy) or None
    task_type: str
    eval_metric: str
    y_dtype: str = "int32"  # "int32" (class id) or "float32" (multi-task)
    max_seq_len: Optional[int] = None
    arr_to_seq: Optional[Callable] = None  # code2 decode
