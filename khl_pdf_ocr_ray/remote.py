"""Worker-side import bootstrap for map_batches callables.

The driver may import this repo from any cwd (the graft driver loads
``__ray_entry__.py`` by path); Ray workers then cannot resolve
``khl_pdf_ocr_ray`` by module name, and a function passed to
``map_batches`` is pickled *by reference* (module + qualname) — the worker
would die on ``ModuleNotFoundError``.

``remote_fn`` / ``remote_cls`` close over only plain strings and data, so
cloudpickle serializes them *by value*; at call time inside the worker they
put the repo root on ``sys.path`` once and import the real target. This is
the portable analogue of shipping a ``working_dir`` runtime_env (which the
driver's pre-initialized local Ray session does not provide).

Static kwargs passed through must be plain data (str/int/dict/...), never
instances of classes from this package.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _normalize_block(out):
    """DataFrame outputs become metadata-free Arrow tables.

    Two reasons: (a) pandas-derived Arrow schemas carry a b'pandas'
    metadata dict that is unhashable, so every downstream hash-shuffle
    logs "Failed to hash the schemas" and loses schema dedup; (b) uniform
    Arrow blocks keep groupby/join/union exchanges zero-copy instead of
    converting per-block at shuffle time."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )
    if isinstance(out, pa.Table) and out.schema.metadata:
        # parquet files written via pandas embed a b'pandas' metadata dict
        # that survives projections/filters and makes the schema unhashable
        return out.replace_schema_metadata(None)
    return out


def identity_batch(batch):
    """No-op body: exists so ``remote_fn(..., "identity_batch")`` applies
    the block normalizer (schema-metadata strip) to raw read outputs."""
    return batch


def remote_fn(module: str, attr: str, **static_kwargs):
    """A by-value-pickled wrapper calling ``module.attr(batch, **kwargs)``."""
    root = REPO_ROOT

    def _fn(batch):
        import importlib
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        target = getattr(importlib.import_module(module), attr)
        norm = importlib.import_module("khl_pdf_ocr_ray.remote")._normalize_block
        return norm(target(batch, **static_kwargs))

    _fn.__name__ = f"{attr}"
    return _fn


def remote_cls(module: str, attr: str):
    """A by-value-pickled callable-class wrapper for actor-pool stages.

    Constructor kwargs are forwarded to the real class, built once per
    actor inside the worker (after the path bootstrap)."""
    root = REPO_ROOT

    class _ActorWrapper:
        def __init__(self, **kwargs):
            import importlib
            import sys

            if root not in sys.path:
                sys.path.insert(0, root)
            cls = getattr(importlib.import_module(module), attr)
            self.inner = cls(**kwargs)

        def __call__(self, batch):
            import importlib

            norm = importlib.import_module("khl_pdf_ocr_ray.remote")._normalize_block
            return norm(self.inner(batch))

    _ActorWrapper.__name__ = attr
    return _ActorWrapper
