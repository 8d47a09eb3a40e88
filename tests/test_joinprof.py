"""join_explosion_profile: the hot key tops the profile with the exact
fan-out product."""


def test_profile_flags_hot_key(ray_session, sf_smoke_dir):
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_joinprof import (
        JOINPROF_K,
        q_join_explosion_profile,
    )

    out = (
        q_join_explosion_profile(sf_smoke_dir)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(out) == JOINPROF_K
    # the planted hot user (~half the stream, 3 build rows) dominates
    top = out.iloc[0]
    assert top["key"] == 0
    assert top["n_right"] == 3
    ev = pq.read_table(f"{sf_smoke_dir}/events.parquet", columns=["event_id", "user_id"]).to_pandas()
    n_hot = int((ev["event_id"] % 2 == 0).sum()) + int(
        ((ev["event_id"] % 2 == 1) & (ev["user_id"] == 0)).sum()
    )
    assert top["n_left"] == n_hot
    assert top["out_rows"] == n_hot * 3
    # ranks strictly ordered by fan-out, descending
    assert (out["out_rows"].diff().dropna() <= 0).all()
    # cold keys: one build row each
    assert (out.iloc[1:]["n_right"] == 1).all()
