"""Workload harnesses: data pipelines, metrics, train/eval loops,
checkpointing, and the model-zoo factory — the reference's Q3/Q4 layers
(ImageNet/main.py, BERT/run_glue.py, olive run_clm.py/run_glue.py/run_qa.py)
rebuilt as a library with thin CLIs in tools/."""

from . import checkpoint, data, evaluate, metrics, train, zoo  # noqa: F401
