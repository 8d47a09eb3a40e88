"""Sequential-oracle dumps: DuckDB-checkable twins for the extraction-,
media- and fingerprint-surface queries.

The driver's correctness gate runs each Ray query next to its
``oracle_sql()`` string in DuckDB. The extraction surface operates on the
engine's own synthesized pages corpus, which the driver's pre-registered
views don't include — round 1 left those queries as weaker rows-only
checks. This module closes that gap: a plain, SEQUENTIAL Python loop (no
Ray — the same independent oracle path the byte-identity e2e test trusts,
``functions/doc_extract.extract_document``) processes the corpus once and
writes small parquet dumps under /tmp/khlray_cache; the oracle SQL then
reads those dumps with ``read_parquet()`` and performs the relational part
(selection, grouping, validation joins) in DuckDB. The driver therefore
certifies that the DISTRIBUTED pipeline (task fan-out, actor-pool OCR,
shuffles, assembly) reproduces the sequential semantics — the per-document
kernels themselves are held by the golden unit tests and the e2e oracle.

The rolling fingerprint dump is computed with an independent power-sum
formulation (not the kernel's Horner loop), so that oracle is independent
end-to-end.

Dumps are cached per pages-corpus directory and rebuilt whenever the
extraction algorithm version changes (the cache key includes
``extraction_version()``).
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Dict, List

import pyarrow as pa
import pyarrow.parquet as pq

from .atomic import ensure_published

_RE_HOST = re.compile(r"^[a-z]+://([^/]+)")
_RE_SHEET = re.compile(r"/(\d{4})/([^/]+)/game-[^/]+-start-ru\.pdf$")

ORACLE_SF = "/root/testdata/sf0.01"  # the driver runs the gate at sf=0.01
N_MEDIA = 200  # matches pipelines.queries_extract._N_MEDIA


def dumps_dir(sf_dir: str) -> str:
    from ..pipelines.extract_pipeline import synthesize_pages
    from .manifest import extraction_version

    pages_dir = synthesize_pages(sf_dir, repeat=2)
    # tables.py feeds the blocks surface but not extraction_version (table
    # detection never changes extracted text) — hash it into THIS key so
    # detector edits rebuild the dumps without invalidating checkpoints
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra_md5 = []
    for rel in (
        "functions/tables.py",
        "functions/urlnorm.py",
        "functions/lines.py",     # line-dedup identity kernel
        "functions/graph.py",     # host-graph / pagerank kernels

        "stages/multimodal.py",   # media_* dump kernels
        "stages/textqc.py",       # fingerprint_rolling twin constants
        "sources/synth.py",       # master lists + media table generators
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            extra_md5.append(hashlib.md5(f.read()).hexdigest())
    key = hashlib.sha256(
        f"{pages_dir}:{extraction_version(None)}:{':'.join(extra_md5)}:v4".encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"oracle_dumps_{key}")


def _join(names: List[str]) -> str:
    return "|".join(names)


def _build_dumps(sf_dir: str, out_dir: str) -> None:
    import zlib
    import glob

    from ..functions.doc_extract import extract_document
    from ..functions.textgeom import reading_order
    from ..pipelines.extract_pipeline import synthesize_pages
    from ..sources import wordbox as wb
    from ..sources.synth import master_lookup_table
    from ..stages.multimodal import (
        AudioFeatureStage,
        ImageFeatureStage,
        VideoFrameSampleStage,
        media_table,
    )
    from ..stages.textqc import ROLL_BASE, ROLL_MOD
    from .manifest import extraction_version

    pages_dir = synthesize_pages(sf_dir, repeat=2)
    os.makedirs(out_dir, exist_ok=True)

    ext: Dict[str, list] = {
        k: []
        for k in (
            "url host season uid content_type engine ok error n_bytes n_chars "
            "match_date match_time team_home team_away ref_main ref_linesmen "
            "gk_home_names gk_home_flags gk_away_names gk_away_flags "
            "raw_ref_line ocr_ref_line ocr_fallback".split()
        )
    }
    names_rows: Dict[str, list] = {"url": [], "kind": [], "name": []}
    words_rows: Dict[str, list] = {
        "url": [], "page": [], "y_x10": [], "x_x10": [], "token": []
    }
    blocks_rows: Dict[str, list] = {
        "url": [], "block_id": [], "kind": [], "text_len": [],
        "link_density_x1e6": [], "text_density_x100": [], "kept": [],
    }
    cells_rows: Dict[str, list] = {
        "url": [], "page": [], "table_id": [], "row": [], "col": [],
        "cell_text": [],
    }
    # line-dedup twin: the shared identity kernel sequentially; DuckDB
    # does the winner/accounting relational part (extract_oracle_sqls)
    from ..functions.lines import kept_line_rows, pos_key

    lines_rows: Dict[str, list] = {
        "url": [], "line_md5": [], "n_chars": [], "pos_key": [],
    }

    # lineage twin: per-fragment (partition) aggregates accumulated in the
    # same sequential pass — partition_id = index in the sorted fragment
    # list, the identical convention manifest.input_partitions uses
    lineage_rows: Dict[str, list] = {
        k: [] for k in (
            "partition_id", "row_count", "bytes_in", "chars_out", "error_rows",
            "extraction_version",
        )
    }
    version = extraction_version(None)

    for pid, frag in enumerate(sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))):
        tbl = pq.read_table(frag, columns=["url", "html", "text"])
        frag_rows = frag_bytes = frag_chars = frag_errors = 0
        for url, payload, pre_text in zip(
            tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["text"].to_pylist()
        ):
            rec = extract_document(payload, pre_text, debug=True)
            frag_rows += 1
            frag_bytes += len(payload) if payload is not None else 0
            frag_chars += len(rec["text"])
            frag_errors += 0 if rec["ok"] else 1
            mh = _RE_HOST.match(url)
            ms = _RE_SHEET.search(url)
            ext["url"].append(url)
            ext["host"].append(mh.group(1) if mh else "")
            ext["season"].append(ms.group(1) if ms else "")
            ext["uid"].append(ms.group(2) if ms else "")
            ext["n_bytes"].append(len(payload) if payload is not None else 0)
            ext["n_chars"].append(len(rec["text"]))
            for k in (
                "content_type engine ok error match_date match_time team_home "
                "team_away raw_ref_line ocr_ref_line ocr_fallback".split()
            ):
                ext[k].append(rec[k])
            for k in (
                "ref_main ref_linesmen gk_home_names gk_home_flags "
                "gk_away_names gk_away_flags".split()
            ):
                ext[k].append(_join(rec[k]))
            for col, kind in (
                ("ref_main", "referee"),
                ("ref_linesmen", "referee"),
                ("gk_home_names", "goalie"),
                ("gk_away_names", "goalie"),
            ):
                for n in rec[col]:
                    names_rows["url"].append(url)
                    names_rows["kind"].append(kind)
                    names_rows["name"].append(n)
            ctype = wb.sniff_content_type(payload)
            if ctype in ("application/x-wbox", "application/pdf"):
                try:
                    doc = wb.parse_payload(payload)
                except wb.PayloadError:
                    doc = None
                if doc is not None:
                    for pno, page in enumerate(doc.pages):
                        for y, x, tok in reading_order(page.words):
                            words_rows["url"].append(url)
                            words_rows["page"].append(pno)
                            words_rows["y_x10"].append(int(y * 10 + 0.5))
                            words_rows["x_x10"].append(int(x * 10 + 0.5))
                            words_rows["token"].append(tok)
                    from ..functions.tables import table_block_rows, table_cell_rows

                    for r in table_block_rows(url, payload):
                        for k in blocks_rows:
                            blocks_rows[k].append(r[k])
                    for r in table_cell_rows(url, payload):
                        for k in cells_rows:
                            cells_rows[k].append(r[k])
            elif ctype == "text/html":
                from ..functions.html_extract import extract_main_content

                for bid, h, n in kept_line_rows(payload):
                    lines_rows["url"].append(url)
                    lines_rows["line_md5"].append(h)
                    lines_rows["n_chars"].append(n)
                    lines_rows["pos_key"].append(pos_key(url, bid))
                for i, b in enumerate(extract_main_content(payload)["blocks"]):
                    blocks_rows["url"].append(url)
                    blocks_rows["block_id"].append(i)
                    blocks_rows["kind"].append(b["kind"])
                    blocks_rows["text_len"].append(len(b["text"]))
                    blocks_rows["link_density_x1e6"].append(int(b["link_density"] * 1e6))
                    blocks_rows["text_density_x100"].append(int(b["text_density"] * 100))
                    blocks_rows["kept"].append(b["kept"])
        lineage_rows["partition_id"].append(pid)
        lineage_rows["row_count"].append(frag_rows)
        lineage_rows["bytes_in"].append(frag_bytes)
        lineage_rows["chars_out"].append(frag_chars)
        lineage_rows["error_rows"].append(frag_errors)
        lineage_rows["extraction_version"].append(version)

    def _write(name: str, cols: Dict[str, list], types: Dict[str, pa.DataType]) -> None:
        arrays = {
            k: pa.array(v, types.get(k, pa.string())) for k, v in cols.items()
        }
        pq.write_table(pa.table(arrays), os.path.join(out_dir, name))

    _write(
        "extracted_seq.parquet",
        ext,
        {"ok": pa.bool_(), "n_bytes": pa.int64(), "n_chars": pa.int64()},
    )
    _write("names_seq.parquet", names_rows, {})
    _write(
        "words_seq.parquet",
        words_rows,
        {"page": pa.int64(), "y_x10": pa.int64(), "x_x10": pa.int64()},
    )
    _write(
        "blocks_seq.parquet",
        blocks_rows,
        {
            "block_id": pa.int64(),
            "text_len": pa.int64(),
            "link_density_x1e6": pa.int64(),
            "text_density_x100": pa.int64(),
            "kept": pa.bool_(),
        },
    )

    _write("lines_seq.parquet", lines_rows, {"n_chars": pa.int64()})

    _write(
        "table_cells_seq.parquet",
        cells_rows,
        {
            "page": pa.int64(),
            "table_id": pa.int64(),
            "row": pa.int64(),
            "col": pa.int64(),
        },
    )

    _write(
        "lineage_seq.parquet",
        lineage_rows,
        {
            "partition_id": pa.int64(),
            "row_count": pa.int64(),
            "bytes_in": pa.int64(),
            "chars_out": pa.int64(),
            "error_rows": pa.int64(),
        },
    )

    master = master_lookup_table()
    pq.write_table(master, os.path.join(out_dir, "master.parquet"))

    # url-dedup twin: the same planted messy variants + canonicalization
    # (functions/urlnorm.py, shared kernel) in one sequential pass

    import pandas as _pd

    from ..functions.urlnorm import normalize_url

    all_urls = (
        pq.read_table(synthesize_pages(sf_dir, repeat=2), columns=["url"])
        .to_pandas()["url"]
        .tolist()
    )
    with_variants = list(all_urls)
    for u in all_urls:
        if zlib.crc32(u.encode()) % 3 == 0:
            scheme, rest = u.split("://", 1)
            host, _, path = rest.partition("/")
            with_variants.append(
                f"{scheme.upper()}://{host.upper()}:443/{path}"
                "?utm_source=feed&fbclid=abc123#frag"
            )
    udf = _pd.DataFrame(
        {"norm_url": [normalize_url(u) for u in with_variants], "url": with_variants}
    )
    udedup = udf.groupby("norm_url", as_index=False).agg(
        n_dups=("url", "size"), keep_url=("url", "min")
    )
    pq.write_table(
        pa.table(
            {
                "norm_url": pa.array(udedup["norm_url"], pa.string()),
                "n_dups": pa.array(udedup["n_dups"].astype("int64"), pa.int64()),
                "keep_url": pa.array(udedup["keep_url"], pa.string()),
            }
        ),
        os.path.join(out_dir, "url_dedup_seq.parquet"),
    )

    # url-template twin: same url_template kernel over the raw page urls
    # (no planted variants), pandas count + the same (n DESC, template ASC)
    # top-20 tie rule
    from ..functions.urlnorm import url_template

    tdf = _pd.DataFrame({"template": [url_template(u) for u in all_urls]})
    ttop = (
        tdf.groupby("template", as_index=False)
        .agg(n_pages=("template", "size"))
        .sort_values(["n_pages", "template"], ascending=[False, True])
        .head(20)
    )
    pq.write_table(
        pa.table(
            {
                "template": pa.array(ttop["template"], pa.string()),
                "n_pages": pa.array(ttop["n_pages"].astype("int64"), pa.int64()),
            }
        ),
        os.path.join(out_dir, "url_templates_seq.parquet"),
    )

    # media features: the deterministic media corpus through the stage
    # kernels sequentially (driver-side, no actors)
    media = media_table(N_MEDIA)
    pq.write_table(
        ImageFeatureStage(target_w=8, target_h=8)(media),
        os.path.join(out_dir, "media_image_seq.parquet"),
    )
    pq.write_table(
        AudioFeatureStage()(media), os.path.join(out_dir, "media_audio_seq.parquet")
    )
    pq.write_table(
        VideoFrameSampleStage(every_k=4)(media),
        os.path.join(out_dir, "media_frames_seq.parquet"),
    )

    # fingerprint near-dup pairs (image phash + audio afp): brute-force
    # ALL-PAIRS Hamming over each planted family corpus (no banding — the
    # independent twin of the distributed banded-LSH plans, which must
    # find exactly these sets)
    import numpy as _np

    from ..stages.multimodal import (
        AFP_HAMMING_MAX,
        PHASH_HAMMING_MAX,
        afp63,
        decode_audio,
        decode_image,
        media_afp_table,
        media_phash_table,
        phash63,
    )

    def _fp_pairs(tbl, hash_fn, ham_max, fname):
        fp = _np.array(
            [hash_fn(p) for p in tbl["payload"].to_pylist()], dtype=_np.uint64
        )
        pids = _np.asarray(tbl["media_id"].to_pylist(), dtype=_np.int64)
        ia, ib = _np.triu_indices(len(pids), k=1)
        ham = _np.zeros(len(ia), dtype=_np.int64)
        x = fp[ia] ^ fp[ib]
        while x.any():  # independent popcount (shift-and-mask, not SWAR)
            ham += (x & 1).astype(_np.int64)
            x >>= _np.uint64(1)
        keep = ham <= ham_max
        pq.write_table(
            pa.table(
                {
                    "id_a": pa.array(_np.minimum(pids[ia[keep]], pids[ib[keep]])),
                    "id_b": pa.array(_np.maximum(pids[ia[keep]], pids[ib[keep]])),
                    "hamming": pa.array(ham[keep]),
                }
            ),
            os.path.join(out_dir, fname),
        )

    _fp_pairs(
        media_phash_table(),
        lambda p: phash63(decode_image(p)),
        PHASH_HAMMING_MAX,
        "media_phash_seq.parquet",
    )
    _fp_pairs(
        media_afp_table(),
        lambda p: afp63(decode_audio(p)[1]),
        AFP_HAMMING_MAX,
        "media_afp_seq.parquet",
    )
    from ..stages.multimodal import decode_video, media_vhash_table, vhash63

    _fp_pairs(
        media_vhash_table(),
        lambda p: vhash63(decode_video(p)),
        PHASH_HAMMING_MAX,
        "media_vhash_seq.parquet",
    )

    # skew partition keys, recomputed sequentially: exact host histogram ->
    # hot hosts (> 20% of rows) -> salted/giant-isolated part_key per row
    # (the crc32 formulas restated inline — they ARE the partitioning spec)

    host_counts: Dict[str, int] = {}
    page_rows: List[tuple] = []  # (host, url, n_bytes)
    for frag in sorted(glob.glob(os.path.join(pages_dir, "*.parquet"))):
        tbl = pq.read_table(frag, columns=["url", "html"])
        for url, payload in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
            mh = _RE_HOST.match(url)
            host = mh.group(1) if mh else ""
            n_bytes = len(payload) if payload is not None else 0
            host_counts[host] = host_counts.get(host, 0) + 1
            page_rows.append((host, url, n_bytes))
    total = sum(host_counts.values())
    hot = {h for h, n in host_counts.items() if n > 0.2 * total}
    n_parts, salt_factor = 64, 8
    giant_threshold, giant_base = 8 * 1024 * 1024, 1 << 20
    agg: Dict[int, List[int]] = {}
    for host, url, n_bytes in page_rows:
        if n_bytes > giant_threshold:
            key = giant_base + (zlib.crc32(url.encode()) % (1 << 16))
        elif host in hot:
            base = zlib.crc32(host.encode()) % n_parts
            key = base * salt_factor + zlib.crc32(url.encode()) % salt_factor
        else:
            key = (zlib.crc32(host.encode()) % n_parts) * salt_factor
        a = agg.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += n_bytes
    pq.write_table(
        pa.table(
            {
                "part_key": pa.array(sorted(agg), pa.int64()),
                "rows": pa.array([agg[k][0] for k in sorted(agg)], pa.int64()),
                "bytes": pa.array([agg[k][1] for k in sorted(agg)], pa.int64()),
            }
        ),
        os.path.join(out_dir, "skew_seq.parquet"),
    )

    # url-blocklist twin: the shared verdict kernel sequentially; the
    # per-host aggregation is plain dict counting (the distributed side's
    # combiner + groupby-Sum is what the gate certifies)
    from ..functions.graph import block_verdict

    blk: Dict[str, list] = {}
    for _h, url, _nb in page_rows:
        h, blocked = block_verdict(url)
        a = blk.setdefault(h, [0, 0])
        a[1 if blocked else 0] += 1
    pq.write_table(
        pa.table(
            {
                "host": pa.array(sorted(blk), pa.string()),
                "kept": pa.array([blk[h][0] for h in sorted(blk)], pa.int64()),
                "blocked": pa.array([blk[h][1] for h in sorted(blk)], pa.int64()),
            }
        ),
        os.path.join(out_dir, "url_block_seq.parquet"),
    )

    # host-pagerank twin: planted edges + the shared integer formula in
    # one sequential pass (functions/graph.py:pagerank_sequential)
    from ..functions.graph import host_edge, pagerank_sequential

    pr_edges: Dict[tuple, int] = {}
    pr_nodes = set()
    for host, url, _nb in page_rows:
        s, dtn = host_edge(url)
        pr_edges[(s, dtn)] = pr_edges.get((s, dtn), 0) + 1
        pr_nodes.add(s)
        pr_nodes.add(dtn)
    pr = pagerank_sequential(pr_edges, pr_nodes)
    pq.write_table(
        pa.table(
            {
                "host": pa.array(sorted(pr), pa.string()),
                "pagerank_fx": pa.array([pr[h] for h in sorted(pr)], pa.int64()),
            }
        ),
        os.path.join(out_dir, "pagerank_seq.parquet"),
    )

    # host-HITS twin: the same planted edge set through the sequential
    # hub/authority iteration (functions/graph.py:hits_sequential)
    from ..functions.graph import hits_sequential

    ha = hits_sequential(pr_edges, pr_nodes)
    pq.write_table(
        pa.table(
            {
                "host": pa.array(sorted(ha), pa.string()),
                "hub_fx": pa.array([ha[h][0] for h in sorted(ha)], pa.int64()),
                "auth_fx": pa.array([ha[h][1] for h in sorted(ha)], pa.int64()),
            }
        ),
        os.path.join(out_dir, "hits_seq.parquet"),
    )

    # rolling fingerprint via an INDEPENDENT power-sum formulation:
    # h = sum(b_i * BASE^(n-1-i)) mod M, computed with precomputed powers —
    # algebraically equal to the kernel's Horner loop but separate code
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ws = re.compile(r"\s+")
    roll_ids, roll_vals = [], []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        norm = ws.sub(" ", (text or "").lower()).strip()
        data = norm.encode("utf-8")
        n = len(data)
        h = 0
        p = 1
        for b in reversed(data):
            h = (h + b * p) % ROLL_MOD
            p = (p * ROLL_BASE) % ROLL_MOD
        roll_ids.append(doc_id)
        roll_vals.append(h)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(roll_ids, pa.int64()),
                "fp_roll": pa.array(roll_vals, pa.int64()),
            }
        ),
        os.path.join(out_dir, "fp_roll_seq.parquet"),
    )


def ensure_dumps(sf_dir: str) -> str:
    out_dir = dumps_dir(sf_dir)
    return ensure_published(out_dir, lambda tmp: _build_dumps(sf_dir, tmp))


def extract_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    """Oracle SQL strings for the dump-backed queries (generating the
    dumps first). Paths are embedded literally; the driver runs these at
    ``ORACLE_SF`` via ``__ray_entry__.oracle_sql()``."""
    from ..pipelines.queries_fuzzy import fuzzy_oracle_sql as _fuzzy_sql

    d = ensure_dumps(sf_dir)

    def p(name: str) -> str:
        return os.path.join(d, name)

    return _alias_same_result({
        "extract_pages": f"""
SELECT url, host, content_type, engine, ok, error, n_bytes, n_chars
FROM read_parquet('{p("extracted_seq.parquet")}')
""",
        "extract_entities": f"""
SELECT url, engine, match_date, match_time, team_home, team_away,
       ref_main, ref_linesmen, gk_home_names, gk_home_flags,
       gk_away_names, gk_away_flags
FROM read_parquet('{p("extracted_seq.parquet")}')
WHERE engine IN ('pdf-text', 'pdf-ocr')
""",
        "extract_refs_mode": f"""
SELECT url, engine, ref_main, ref_linesmen
FROM read_parquet('{p("extracted_seq.parquet")}')
WHERE engine IN ('pdf-text', 'pdf-ocr')
""",
        "ref_team_matrix": f"""
WITH g AS (
  SELECT unnest(string_split(ref_main, '|')) AS referee,
         team_home, team_away
  FROM read_parquet('{p("extracted_seq.parquet")}')
  WHERE engine IN ('pdf-text', 'pdf-ocr') AND ref_main <> ''),
pairs AS (
  SELECT referee, team_home AS team FROM g WHERE team_home <> ''
  UNION ALL
  SELECT referee, team_away FROM g WHERE team_away <> '')
SELECT referee, team, CAST(count(*) AS BIGINT) AS n_games
FROM pairs WHERE referee <> ''
GROUP BY referee, team
""",
        "extract_host_stats": f"""
SELECT host, content_type, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS bytes_in,
       CAST(sum(n_chars) AS BIGINT) AS chars_out
FROM read_parquet('{p("extracted_seq.parquet")}')
GROUP BY host, content_type
""",
        "extract_error_rates": f"""
SELECT host, engine,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_err,
       CAST((1000 * sum(CASE WHEN ok THEN 0 ELSE 1 END))
            // GREATEST(count(*), 1) AS BIGINT) AS err_milli
FROM read_parquet('{p("extracted_seq.parquet")}')
GROUP BY host, engine
""",
        "master_fuzzy_match": _fuzzy_sql(
            p("extracted_seq.parquet"), p("master.parquet")
        ),
        "master_validate": f"""
-- both kinds ALWAYS present (the engine emits zero-count rows for a kind
-- that extracted nothing; the bare GROUP BY would drop it)
WITH counts AS (
  SELECT kind, CAST(count(*) AS BIGINT) AS n_names,
         CAST(sum(CASE WHEN (kind = 'referee' AND name IN
                   (SELECT name FROM read_parquet('{p("master.parquet")}')
                    WHERE kind = 'referee'))
               OR (kind = 'goalie' AND name IN
                   (SELECT name FROM read_parquet('{p("master.parquet")}')
                    WHERE kind = 'player'))
              THEN 1 ELSE 0 END) AS BIGINT) AS n_validated
  FROM read_parquet('{p("names_seq.parquet")}')
  GROUP BY kind
)
SELECT k.kind, coalesce(c.n_names, 0) AS n_names,
       coalesce(c.n_validated, 0) AS n_validated
FROM (SELECT 'referee' AS kind UNION ALL SELECT 'goalie') k
LEFT JOIN counts c ON k.kind = c.kind
""",
        "pdf_words": f"""
SELECT url, page, y_x10, x_x10, token
FROM read_parquet('{p("words_seq.parquet")}')
""",
        "extract_blocks": f"""
SELECT url, block_id, kind, text_len, link_density_x1e6,
       text_density_x100, kept
FROM read_parquet('{p("blocks_seq.parquet")}')
""",
        "fingerprint_rolling": f"""
SELECT doc_id, fp_roll FROM read_parquet('{p("fp_roll_seq.parquet")}')
""",
        "skew_partition_stats": f"""
SELECT part_key, rows, bytes FROM read_parquet('{p("skew_seq.parquet")}')
""",
        "lineage": f"""
SELECT partition_id, row_count, bytes_in, chars_out, error_rows,
       extraction_version
FROM read_parquet('{p("lineage_seq.parquet")}')
""",
        "host_pagerank": f"""
SELECT host, pagerank_fx FROM read_parquet('{p("pagerank_seq.parquet")}')
""",
        "host_hits": f"""
SELECT host, hub_fx, auth_fx FROM read_parquet('{p("hits_seq.parquet")}')
""",
        "url_blocklist": f"""
SELECT host, kept, blocked FROM read_parquet('{p("url_block_seq.parquet")}')
""",
        "line_dedup": f"""
-- relational twin of the C4-style line dedup: winner = min pos_key per
-- line hash (the same packed key the Ray plan aggregates), then per-url
-- accounting over the sequential line dump
WITH l AS (SELECT * FROM read_parquet('{p("lines_seq.parquet")}')),
w AS (SELECT line_md5, min(pos_key) AS keep_key FROM l GROUP BY line_md5)
SELECT l.url, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l.pos_key <> w.keep_key THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN l.pos_key = w.keep_key THEN l.n_chars ELSE 0 END)
            AS BIGINT) AS chars_kept
FROM l JOIN w USING (line_md5)
GROUP BY l.url
""",
        "url_dedup": f"SELECT norm_url, n_dups, keep_url FROM read_parquet('{p('url_dedup_seq.parquet')}')",
        "url_template_topk": f"SELECT template, n_pages FROM read_parquet('{p('url_templates_seq.parquet')}')",
        "media_image_features": f"SELECT * FROM read_parquet('{p('media_image_seq.parquet')}')",
        "media_audio_features": f"SELECT * FROM read_parquet('{p('media_audio_seq.parquet')}')",
        "media_frame_sample": f"SELECT * FROM read_parquet('{p('media_frames_seq.parquet')}')",
        "media_phash_dups": f"SELECT * FROM read_parquet('{p('media_phash_seq.parquet')}')",
        "media_audiofp_dups": f"SELECT * FROM read_parquet('{p('media_afp_seq.parquet')}')",
        "media_vhash_dups": f"SELECT * FROM read_parquet('{p('media_vhash_seq.parquet')}')",
        # dump-derived eval: the pair sets ARE the certified dumps; the
        # variants / planted-total constants are IMPORTED from
        # stages.multimodal (same source as the Ray side) — never
        # re-hardcoded here. A modality with an empty pair set still
        # yields its row (LEFT JOIN against the modality list) with
        # precision 0, matching pr_finalize's zero guard.
        "fingerprint_pr_eval": _fp_pr_eval_sql(p),
        "crawl_schedule": _crawl_schedule_sql(p),
        "pdf_table_cells": (
            "SELECT url, page, table_id, row, col, cell_text "
            f"FROM read_parquet('{p('table_cells_seq.parquet')}')"
        ),
    })


def _crawl_schedule_sql(p) -> str:
    """crawl_schedule oracle: independent DuckDB derivation (host
    counts, char hash, worker assignment, greatest() bound) over the
    sequential pages dump; constants imported from the query module."""
    from ..pipelines.queries_crawl import crawl_schedule_dump_sql

    return crawl_schedule_dump_sql(p("extracted_seq.parquet"))


def _fp_pr_eval_sql(p) -> str:
    """fingerprint_pr_eval oracle SQL with constants imported from the
    same module the Ray side reads (stages.multimodal)."""
    from ..stages.multimodal import N_PHASH_FAMILIES, PHASH_VARIANTS

    v = PHASH_VARIANTS
    planted = N_PHASH_FAMILIES * (v * (v - 1) // 2)
    return f"""
WITH pairs AS (
  SELECT 'phash' AS modality, id_a, id_b
  FROM read_parquet('{p('media_phash_seq.parquet')}')
  UNION ALL
  SELECT 'audiofp', id_a, id_b
  FROM read_parquet('{p('media_afp_seq.parquet')}')
  UNION ALL
  SELECT 'vhash', id_a, id_b
  FROM read_parquet('{p('media_vhash_seq.parquet')}')),
mods AS (SELECT unnest(['phash', 'audiofp', 'vhash']) AS modality),
c AS (
  SELECT m.modality,
    CAST(coalesce(sum(CASE WHEN id_a // {v} = id_b // {v}
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
    CAST(coalesce(sum(CASE WHEN id_a IS NULL THEN 0
                           WHEN id_a // {v} = id_b // {v}
                           THEN 0 ELSE 1 END), 0) AS BIGINT) AS fp
  FROM mods m LEFT JOIN pairs USING (modality) GROUP BY 1)
SELECT modality, tp, fp, CAST({planted} - tp AS BIGINT) AS fn,
  CAST(CASE WHEN tp + fp = 0 THEN 0
            ELSE 1000 * tp // (tp + fp) END AS BIGINT) AS precision_permille,
  CAST(1000 * tp // {planted} AS BIGINT) AS recall_permille,
  CAST(2000 * tp // (2 * tp + fp + ({planted} - tp)) AS BIGINT)
    AS f1_permille
FROM c
"""


def _alias_same_result(sqls: Dict[str, str]) -> Dict[str, str]:
    """Queries whose PHYSICAL plan differs but whose result is defined to
    be identical to an existing query share that query's oracle — the
    gate then checks plan-equivalence (e.g. the Bloom-prefiltered line
    dedup against the exact line dedup)."""
    sqls["bloom_line_dedup"] = sqls["line_dedup"]
    return sqls
