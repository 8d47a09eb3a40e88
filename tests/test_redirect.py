"""redirect_resolve: pointer-doubling correctness and loud cycle guard."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_redirect_map_kernel():
    from khl_pdf_ocr_ray.pipelines.queries_redirect import (
        REDIRECT_MOD,
        redirect_map_batch,
    )

    ids = pa.table({"doc_id": pa.array([0, 1, 16, 17, 31], pa.int64())})
    out = redirect_map_batch(ids).to_pandas().set_index("x")
    assert out.loc[0, "p"] == 0 and out.loc[0, "hops"] == 0      # terminal
    assert out.loc[16, "p"] == 16 and out.loc[16, "hops"] == 0   # terminal
    assert out.loc[1, "p"] == 0 and out.loc[1, "hops"] == 1
    assert out.loc[31, "p"] == 30 and out.loc[31, "hops"] == 1


def test_resolve_terminals_and_hops(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_redirect import (
        REDIRECT_MOD,
        q_redirect_resolve,
    )

    out = q_redirect_resolve(sf_smoke_dir).to_pandas()
    # every terminal is a real terminal and hops equal the chain algebra
    assert (out["terminal_id"] % REDIRECT_MOD == 0).all()
    assert (out["terminal_id"] == out["url_id"] - out["url_id"] % REDIRECT_MOD).all()
    assert (out["hops"] == out["url_id"] % REDIRECT_MOD).all()
    # doubling resolved 15-hop chains (log rounds, not 15 iterations)
    assert int(out["hops"].max()) == REDIRECT_MOD - 1


def test_resolve_cycle_fails_loudly(ray_session):
    """A REAL injected 2-cycle must hit the round cap and raise. The
    2-cycle leaves the p-sum invariant, so this also pins the
    convergence check to the hops sum (a target-sum check would falsely
    converge and silently emit unresolved rows)."""
    import pytest as _pytest
    import ray.data as rd

    from khl_pdf_ocr_ray.pipelines.queries_redirect import resolve_mapping

    x = np.array([0, 1, 2], dtype=np.int64)
    p = np.array([0, 2, 1], dtype=np.int64)  # 1 <-> 2 cycle, 0 terminal
    hops = (x != p).astype(np.int64)
    mapping = rd.from_arrow(
        pa.table({"x": pa.array(x), "p": pa.array(p), "hops": pa.array(hops)})
    )
    with _pytest.raises(RuntimeError, match="cycle"):
        resolve_mapping(mapping, max_rounds=4)
