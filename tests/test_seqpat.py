"""seq_pair_support: planted-order micro cases + combiner invariance."""

import pandas as pd
import pyarrow as pa


def test_pairs_kernel_first_before_last():
    from khl_pdf_ocr_ray.pipelines.queries_seqpat import seqpat_pairs_kernel

    # user 1: A@[1,5], B@[3,4] -> A->B (1<4), B->A (3<5), A->A (1<5), B->B (3<4)
    # user 2: A@[10,10], B@[2,2] -> B->A only (2<10); A->B fails (10<2 no);
    #         A->A fails (10<10 not strict), B->B fails
    g = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "event_type": ["A", "B", "A", "B"],
            "f": [1, 3, 10, 2],
            "l": [5, 4, 10, 2],
        }
    )
    out = seqpat_pairs_kernel(g)
    sup = {(r.ta, r.tb): r.support for r in out.itertuples()}
    assert sup == {("A", "B"): 1, ("B", "A"): 2, ("A", "A"): 1, ("B", "B"): 1}


def test_fl_partial_merges_like_whole(ray_session):
    """Min/Max first-last partials are batching-invariant: two half
    batches merged == one whole batch."""
    import numpy as np

    from khl_pdf_ocr_ray.pipelines.queries_seqpat import seqpat_fl_partial

    ts = pa.array(
        np.array([10, 20, 30, 40], dtype="int64"), pa.timestamp("us")
    )
    whole = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": ["x", "x", "x", "x"],
            "ts": ts,
        }
    )
    a = seqpat_fl_partial(whole.slice(0, 2))
    b = seqpat_fl_partial(whole.slice(2, 2))
    merged_f = min(a["f"][0].as_py(), b["f"][0].as_py())
    merged_l = max(a["l"][0].as_py(), b["l"][0].as_py())
    w = seqpat_fl_partial(whole)
    assert (merged_f, merged_l) == (w["f"][0].as_py(), w["l"][0].as_py())


def test_seq_pair_support_query(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_seqpat import q_seq_pair_support

    df = q_seq_pair_support(sf_smoke_dir).to_pandas()
    assert len(df) > 0
    assert (df["support"] > 0).all()
    # support is bounded by the user count
    import pyarrow.parquet as pq

    n_users = len(
        set(pq.read_table(f"{sf_smoke_dir}/events.parquet", columns=["user_id"])["user_id"].to_pylist())
    )
    assert (df["support"] <= n_users).all()
