"""Kernel + branch checks for the link-prediction and lexical-diversity
operators beyond oracle parity: wedge enumeration against a brute-force
reference on a known tiny graph, broadcast-vs-join branch equivalence
(the 100 TB path), and the lexstats partials against hand counts."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_lexstats import (
    LEX_SCALE,
    lex_rollup_partial,
    lex_trigram_partial,
    lex_word_partial,
)
from khl_pdf_ocr_ray.pipelines.queries_linkpred import (
    LP_SCALE,
    lp_two_hop_group,
    lp_wedge_group,
)


def _brute_scores(edges):
    """Reference common-neighbor / RA / Jaccard over non-adjacent pairs."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    out = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            cn = len(common)
            ra = sum(LP_SCALE // len(adj[w]) for w in common)
            jac = (cn * LP_SCALE) // (len(adj[u]) + len(adj[v]) - cn)
            out[(u, v)] = (cn, ra, jac)
    return out


def _scores_via_kernels(edges):
    """Drive lp_wedge_group per center + the driver-side reductions the
    distributed plan performs, without Ray."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    parts = []
    for w, nbrs in adj.items():
        g = pd.DataFrame({"dst": sorted(nbrs)})
        parts.append(lp_wedge_group(g))
    allp = pd.concat(parts, ignore_index=True)
    red = (
        allp.groupby(["u", "v"], as_index=False)
        .agg(cn=("cnt", "sum"), ra_fx=("ra", "sum"))
    )
    edge_set = {(min(a, b), max(a, b)) for a, b in edges}
    out = {}
    for _, r in red.iterrows():
        u, v = int(r["u"]), int(r["v"])
        if (u, v) in edge_set:
            continue
        jac = (int(r["cn"]) * LP_SCALE) // (
            len(adj[u]) + len(adj[v]) - int(r["cn"])
        )
        out[(u, v)] = (int(r["cn"]), int(r["ra_fx"]), jac)
    return out


def test_wedge_kernel_matches_bruteforce():
    rng = np.random.default_rng(7)
    edges = set()
    while len(edges) < 60:
        a, b = rng.integers(0, 18, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    assert _scores_via_kernels(edges) == _brute_scores(edges)


def test_two_hop_kernel_paths():
    # path graph 0-1-2-3: 2-hop pairs through each center
    g = pd.DataFrame({"dst": [0, 2]})  # center 1
    out = lp_two_hop_group(g)
    pairs = set(zip(out["u"], out["v"]))
    assert pairs == {(0, 2), (2, 0)}
    assert (out["cnt"] == 1).all()
    # degree-1 center emits nothing
    assert lp_two_hop_group(pd.DataFrame({"dst": [5]})).empty


def test_linkpred_join_branch_matches_broadcast(
    ray_session, sf_smoke_dir, monkeypatch
):
    """Force the large-|V| keyed-join branch (the 100 TB path) and check
    both queries produce identical tables."""
    import khl_pdf_ocr_ray.pipelines.queries_linkpred as ql

    cn_b = ql.q_graph_common_neighbors(sf_smoke_dir).to_pandas()
    th_b = ql.q_graph_two_hop(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(ql, "LP_BROADCAST_MAX", 0)
    cn_j = ql.q_graph_common_neighbors(sf_smoke_dir).to_pandas()
    th_j = ql.q_graph_two_hop(sf_smoke_dir).to_pandas()

    def norm(df, keys):
        return (
            df.sort_values(keys)
            .reset_index(drop=True)
            .reindex(sorted(df.columns), axis=1)
        )

    assert norm(cn_b, ["u", "v"]).equals(norm(cn_j, ["u", "v"]))
    assert norm(th_b, ["node"]).equals(norm(th_j, ["node"]))


def _tbl(rows):
    langs, texts = zip(*rows)
    return pa.table(
        {"lang": pa.array(langs, pa.string()), "text": pa.array(texts)}
    )


def test_lex_word_partial_counts():
    t = _tbl([("en", "a b a"), ("en", "b c"), ("ru", "a a")])
    out = lex_word_partial(t)
    got = {
        (l, g): n
        for l, g, n in zip(
            out["lang"].to_pylist(), out["gram"].to_pylist(),
            out["n"].to_pylist(),
        )
    }
    assert got == {
        ("en", "a"): 2, ("en", "b"): 2, ("en", "c"): 1, ("ru", "a"): 2
    }


def test_lex_trigram_partial_within_doc_only():
    # trigrams never span documents; doc with < 3 tokens emits none
    t = _tbl([("en", "a b c d"), ("en", "x y"), ("ru", "p q r")])
    out = lex_trigram_partial(t)
    got = {
        (l, g): n
        for l, g, n in zip(
            out["lang"].to_pylist(), out["gram"].to_pylist(),
            out["n"].to_pylist(),
        )
    }
    assert got == {("en", "a b c"): 1, ("en", "b c d"): 1, ("ru", "p q r"): 1}


def test_lex_rollup_and_ratio_mergeable():
    # splitting the reduced gram table across batches must not change
    # the rollup (types = row count, tokens = sum n, both Sum-merged)
    full = pa.table(
        {
            "lang": pa.array(["en", "en", "ru"], pa.string()),
            "gram": pa.array(["a", "b", "a"], pa.string()),
            "n": pa.array([3, 2, 5], pa.int64()),
        }
    )
    whole = lex_rollup_partial(full).to_pandas()
    parts = pa.concat_tables(
        [lex_rollup_partial(full.slice(0, 1)),
         lex_rollup_partial(full.slice(1))]
    ).to_pandas()
    merged = parts.groupby("lang", as_index=False).sum()
    assert (
        whole.sort_values("lang").reset_index(drop=True).equals(
            merged.sort_values("lang").reset_index(drop=True)
        )
    )
    en = whole[whole["lang"] == "en"].iloc[0]
    assert (int(en["types"]) * LEX_SCALE) // int(en["tokens"]) == (
        2 * LEX_SCALE
    ) // 5
