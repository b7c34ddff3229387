from .export import (
    export_eval_fn,
    load_exported,
    run_exported,
    save_exported,
)

__all__ = [
    "export_eval_fn",
    "load_exported",
    "run_exported",
    "save_exported",
]
