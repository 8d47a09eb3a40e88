"""Extraction-surface queries over the synthesized pages corpus.

These operate on the engine's own input table (BASELINE.json input_hint
shape), which the driver's DuckDB views do not include — so they are
rows-only checks for the driver; the pytest suite holds the byte-identity
oracle (tests/test_pipeline_e2e.py).

Every query synthesizes the deterministic corpus for the given sf_dir
(cached under /tmp/khlray_cache) and streams the extract pipeline over it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn
from ..pipelines.extract_pipeline import run_extract, synthesize_pages

_REPEAT = 2  # rep>0 rows are near-duplicate variants (dedup-friendly corpus)
PR_BROADCAST_MAX = 1 << 20  # host tables below this broadcast per round


def _extracted(sf_dir: str) -> rd.Dataset:
    """The extracted corpus as a Dataset — computed by the streaming
    pipeline ONCE per (corpus, extraction-version) and cached as parquet:
    six query surfaces consume it, and re-running the full extraction per
    query would multiply the gate's wall time for no extra coverage (the
    first builder IS the real distributed pipeline; materialize-shared-
    intermediate pattern)."""
    import hashlib

    from ..state.atomic import ensure_published
    from ..state.manifest import extraction_version

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    key = hashlib.sha256(
        f"{pages_dir}:{extraction_version(None)}:q1".encode()
    ).hexdigest()[:16]
    out_dir = f"/tmp/khlray_cache/extractedq_{key}"

    def _build(tmp_dir: str) -> None:
        run_extract(pages_dir).write_parquet(tmp_dir)

    ensure_published(out_dir, _build)
    return rd.read_parquet(out_dir)


def q_extract_pages(sf_dir: str) -> rd.Dataset:
    """Flagship surface: extraction result summary per url (text kept out of
    the driver-hash surface; byte-identity is pytest's job)."""
    return _extracted(sf_dir).select_columns(
        ["url", "host", "content_type", "engine", "ok", "error", "n_bytes", "n_chars"]
    )


def q_extract_entities(sf_dir: str) -> rd.Dataset:
    """Entity extraction results for the gamesheet subset (the reference's
    three extractors, app.py:138-343, as flat columns)."""
    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "entities_project"),
            batch_format="pyarrow",
        )
    )


_LIST_COLS = (
    "ref_main",
    "ref_linesmen",
    "gk_home_names",
    "gk_home_flags",
    "gk_away_names",
    "gk_away_flags",
)


def _join_list_cols(t: pa.Table, cols) -> pa.Table:
    """list<string> -> '|'-joined string columns (hash-comparable against
    the DuckDB oracle dump, which stores the same joined form)."""
    for c in cols:
        joined = pa.array(
            ["|".join(v) for v in t[c].to_pylist()], pa.string()
        )
        t = t.set_column(t.schema.get_field_index(c), c, joined)
    return t


def entities_project(batch: pa.Table) -> pa.Table:
    keep = pc.or_(
        pc.equal(batch["engine"], "pdf-text"), pc.equal(batch["engine"], "pdf-ocr")
    )
    t = batch.filter(keep).select(
        [
            "url",
            "engine",
            "match_date",
            "match_time",
            "team_home",
            "team_away",
            "ref_main",
            "ref_linesmen",
            "gk_home_names",
            "gk_home_flags",
            "gk_away_names",
            "gk_away_flags",
        ]
    )
    return _join_list_cols(t, _LIST_COLS)


def q_extract_host_stats(sf_dir: str) -> rd.Dataset:
    """Per-(host, content_type) corpus stats over extracted output
    (SURVEY.md §2.5 A2 on the pages surface)."""
    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "host_stats_partial"),
            batch_format="pyarrow",
        )
        .groupby(["host", "content_type"])
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("bytes_in", alias_name="bytes_in"),
            Sum("chars_out", alias_name="chars_out"),
        )
    )


def q_extract_error_rates(sf_dir: str) -> rd.Dataset:
    """Per-(host, engine) extraction error rates over the pipeline output
    — the operational QC report a crawl operator reads to spot hosts
    whose payloads break the parser (retry budget / blocklist feed).
    (host, engine, n_pages, n_err, err_milli), err_milli exact integer.

    Plan: map-side (host, engine) combiner (in-band ok=false rows are
    counted, never dropped — the reference's error-row contract,
    app.py:349-362), ONE host-cardinality exchange, map-only milli
    finalize. Oracle: the same rollup over the sequential pages dump."""
    from ray.data.aggregate import Sum

    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_extract",
                "error_rates_partial",
            ),
            batch_format="pyarrow",
        )
        .groupby(["host", "engine"])
        .aggregate(
            Sum("n", alias_name="n_pages"),
            Sum("n_err", alias_name="n_err"),
        )
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_extract",
                "error_rates_finalize",
            ),
            batch_format="pyarrow",
        )
    )


def error_rates_partial(batch: pa.Table) -> pa.Table:
    df = batch.select(["host", "engine", "ok"]).to_pandas()
    df["err"] = (~df["ok"].astype(bool)).astype("int64")
    g = df.groupby(["host", "engine"], as_index=False, dropna=False).agg(
        n=("err", "size"), n_err=("err", "sum")
    )
    g["host"] = g["host"].fillna("")
    for c in ("n", "n_err"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def error_rates_finalize(batch: pa.Table) -> pa.Table:
    import numpy as np

    n = batch["n_pages"].to_numpy(zero_copy_only=False).astype(np.int64)
    e = batch["n_err"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column(
        "err_milli", pa.array(1000 * e // np.maximum(n, 1), pa.int64())
    )


def host_stats_partial(batch: pa.Table) -> pa.Table:
    df = batch.select(["host", "content_type", "n_bytes", "n_chars"]).to_pandas()
    g = df.groupby(["host", "content_type"], as_index=False, dropna=False).agg(
        n=("n_bytes", "size"), bytes_in=("n_bytes", "sum"), chars_out=("n_chars", "sum")
    )
    g["host"] = g["host"].fillna("")  # non-matching urls keep their rows
    for c in ("n", "bytes_in", "chars_out"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


# --- broadcast master-name validation (SURVEY.md §2.4 J1) -------------------
def q_master_validate(sf_dir: str) -> rd.Dataset:
    """Validate extracted referee/goalie names against the master-name side
    table: the canonical broadcast map-side join (ray.put once; a set probe
    per name inside map_batches — no shuffle for the join itself)."""
    from ..sources.synth import master_lookup_table

    master = master_lookup_table()
    ref_names = frozenset(
        n for n, k in zip(master["name"].to_pylist(), master["kind"].to_pylist()) if k == "referee"
    )
    player_names = frozenset(
        n for n, k in zip(master["name"].to_pylist(), master["kind"].to_pylist()) if k == "player"
    )
    names_ref = ray.put((ref_names, player_names))
    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_extract",
                "validate_names_partial",
                names_ref=names_ref,
            ),
            batch_format="pyarrow",
        )
        .groupby("kind")
        .aggregate(
            Sum("n_names", alias_name="n_names"),
            Sum("n_validated", alias_name="n_validated"),
        )
    )


def validate_names_partial(batch: pa.Table, names_ref) -> pa.Table:
    import ray as _ray

    ref_names, player_names = _ray.get(names_ref)
    counts = {
        "referee": [0, 0],
        "goalie": [0, 0],
    }
    for col, kind, valid in (
        ("ref_main", "referee", ref_names),
        ("ref_linesmen", "referee", ref_names),
        ("gk_home_names", "goalie", player_names),
        ("gk_away_names", "goalie", player_names),
    ):
        for names in batch[col].to_pylist():
            for n in names or []:
                counts[kind][0] += 1
                if n in valid:
                    counts[kind][1] += 1
    return pa.table(
        {
            "kind": ["referee", "goalie"],
            "n_names": pa.array([counts["referee"][0], counts["goalie"][0]], pa.int64()),
            "n_validated": pa.array(
                [counts["referee"][1], counts["goalie"][1]], pa.int64()
            ),
        }
    )


# --- skew-aware partitioning surface ----------------------------------------
def q_skew_partition_stats(sf_dir: str) -> rd.Dataset:
    """Salted-host + giant-isolation partition keys over the pages corpus,
    reported as per-key (rows, bytes) — the balance evidence for the skew
    shuffle (stages/skew.py)."""
    from ..stages.skew import detect_hot_hosts

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    pages = (
        rd.read_parquet(pages_dir, columns=["url", "html"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.extract", "meta_stage"),
            batch_format="pyarrow",
        )
        # metadata-only query from here on: drop the payload BEFORE
        # pinning in the object store (html would otherwise hold the whole
        # corpus's bytes resident for a stats query)
        .select_columns(["url", "host", "n_bytes"])
        .materialize()  # consumed twice (hot-host sample + keying): run once
    )
    hot = detect_hot_hosts(pages.select_columns(["host", "url"]))
    keyed = pages.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.skew", "add_partition_key", hot_hosts=hot),
        batch_format="pyarrow",
    )
    return (
        keyed.map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.skew", "partition_stats"),
            batch_format="pyarrow",
        )
        .groupby("part_key")
        .aggregate(Sum("rows", alias_name="rows"), Sum("bytes", alias_name="bytes"))
    )


# --- lineage / resumable checkpoint surface ---------------------------------
def q_lineage(sf_dir: str) -> pa.Table:
    """Run the resumable extract job (skipping already-manifested
    partitions) and return the per-partition lineage table. Calling this
    twice is itself the resume path: the second call processes nothing."""
    import hashlib

    from ..state.manifest import lineage_table, run_resumable_extract

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    key = hashlib.sha256(pages_dir.encode()).hexdigest()[:12]
    out_dir = f"/tmp/khlray_cache/extracted_{key}"
    run_resumable_extract(pages_dir, out_dir)
    t = lineage_table(out_dir)
    return t.drop_columns(["wall_s"])  # wall time is not deterministic




# --- multimodal surfaces (stages/multimodal.py) -----------------------------
_MM = "khl_pdf_ocr_ray.stages.multimodal"
_N_MEDIA = 200


def _media_ds() -> rd.Dataset:
    """Deterministic media corpus as a Dataset (binary payload column)."""
    from ..stages.multimodal import media_table

    return rd.from_arrow(media_table(_N_MEDIA)).repartition(8)


def q_media_image_features(sf_dir: str) -> rd.Dataset:
    """Image decode + stats + thumbnail dims via an actor-pool stage (small
    batches: binary payloads are the wide rows of the memory rule)."""
    from ..remote import remote_cls

    return _media_ds().map_batches(
        remote_cls(_MM, "ImageFeatureStage"),
        fn_constructor_kwargs={"target_w": 8, "target_h": 8},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, 4),
        num_cpus=0.5,
    )


def q_media_audio_features(sf_dir: str) -> rd.Dataset:
    from ..remote import remote_cls

    return _media_ds().map_batches(
        remote_cls(_MM, "AudioFeatureStage"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, 4),
        num_cpus=0.5,
    )


def q_media_frame_sample(sf_dir: str) -> rd.Dataset:
    from ..remote import remote_cls

    return _media_ds().map_batches(
        remote_cls(_MM, "VideoFrameSampleStage"),
        fn_constructor_kwargs={"every_k": 4},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, 4),
        num_cpus=0.5,
    )




# --- mode dispatch + exploded words (reference M11 / M2 surfaces) -----------
def q_extract_refs_mode(sf_dir: str) -> rd.Dataset:
    """mode=refs pipeline: only the referee extractor (+its OCR fallback)
    runs — the engine analogue of GET /extract?mode=refs (app.py:405-412)."""
    from ..pipelines.extract_pipeline import ExtractConfig

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    cfg = ExtractConfig(mode="refs")
    return run_extract(pages_dir, cfg).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "refs_project"),
        batch_format="pyarrow",
    )


def refs_project(batch: pa.Table) -> pa.Table:
    keep = pc.or_(
        pc.equal(batch["engine"], "pdf-text"), pc.equal(batch["engine"], "pdf-ocr")
    )
    t = batch.filter(keep).select(["url", "engine", "ref_main", "ref_linesmen"])
    return _join_list_cols(t, ("ref_main", "ref_linesmen"))


def q_pdf_words(sf_dir: str) -> rd.Dataset:
    """The exploded words table (url, page, y, x, token) in reading order —
    the reference's text_words intermediate (app.py:86-94) as a queryable
    surface."""
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.extract", "words_explode_batch"),
        batch_format="pyarrow",
    )




def q_extract_blocks(sf_dir: str) -> rd.Dataset:
    """The scored block table (SURVEY.md §1.2 ``blocks``): every candidate
    HTML block with its text/link-density scores and the keep decision —
    the explainability surface of the boilerplate stripper — plus TABLE
    REGIONS detected on WBOX/PDF pages (functions/tables.py: aligned
    multi-column word grids, kind='table:pPrRcC')."""
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "blocks_explode"),
        batch_format="pyarrow",
    )


def blocks_explode(batch: pa.Table) -> pa.Table:
    from ..functions.html_extract import extract_main_content
    from ..functions.tables import table_block_rows
    from ..sources.wordbox import sniff_content_type

    rows = {
        "url": [],
        "block_id": [],
        "kind": [],
        "text_len": [],
        "link_density_x1e6": [],
        "text_density_x100": [],
        "kept": [],
    }
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        ctype = sniff_content_type(payload)
        if ctype in ("application/x-wbox", "application/pdf"):
            for r in table_block_rows(url, payload):
                for k in rows:
                    rows[k].append(r[k])
            continue
        if ctype != "text/html":
            continue
        for i, b in enumerate(extract_main_content(payload)["blocks"]):
            rows["url"].append(url)
            rows["block_id"].append(i)
            rows["kind"].append(b["kind"])
            rows["text_len"].append(len(b["text"]))
            rows["link_density_x1e6"].append(int(b["link_density"] * 1e6))
            rows["text_density_x100"].append(int(b["text_density"] * 100))
            rows["kept"].append(b["kept"])
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "block_id": pa.array(rows["block_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "text_len": pa.array(rows["text_len"], pa.int64()),
            "link_density_x1e6": pa.array(rows["link_density_x1e6"], pa.int64()),
            "text_density_x100": pa.array(rows["text_density_x100"], pa.int64()),
            "kept": pa.array(rows["kept"], pa.bool_()),
        }
    )


def table_cells_explode(batch: pa.Table) -> pa.Table:
    """One row per structured table CELL of every WBOX/PDF page — the
    north_star's table-region segmentation resolved to its grid (the
    blocks surface reports regions; this surface reports contents)."""
    from ..functions.tables import table_cell_rows
    from ..sources.wordbox import sniff_content_type

    cols = {k: [] for k in ("url", "page", "table_id", "row", "col", "cell_text")}
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        if sniff_content_type(payload) not in ("application/x-wbox", "application/pdf"):
            continue
        for r in table_cell_rows(url, payload):
            for k in cols:
                cols[k].append(r[k])
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "page": pa.array(cols["page"], pa.int64()),
            "table_id": pa.array(cols["table_id"], pa.int64()),
            "row": pa.array(cols["row"], pa.int64()),
            "col": pa.array(cols["col"], pa.int64()),
            "cell_text": pa.array(cols["cell_text"], pa.string()),
        }
    )


def q_pdf_table_cells(sf_dir: str) -> rd.Dataset:
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "table_cells_explode"),
        batch_format="pyarrow",
    )


def url_variants_batch(batch: pa.Table) -> pa.Table:
    """Plant deterministic messy-URL variants (same pattern as
    stages.dedup.docs_with_variants plants near-dup texts): every url with
    crc32 % 3 == 0 also appears as an uppercase-scheme/host copy with an
    explicit default port, tracking params and a fragment — all of which
    canonicalize away, so the variant normalizes to the SAME key."""
    import zlib

    urls = batch["url"].to_pylist()
    out = list(urls)
    for u in urls:
        if zlib.crc32(u.encode()) % 3 == 0:
            scheme, rest = u.split("://", 1)
            host, _, path = rest.partition("/")
            out.append(
                f"{scheme.upper()}://{host.upper()}:443/{path}"
                "?utm_source=feed&fbclid=abc123#frag"
            )
    return pa.table({"url": pa.array(out, pa.string())})


def url_norm_batch(batch: pa.Table) -> pa.Table:
    from ..functions.urlnorm import normalize_url

    urls = batch["url"].to_pylist()
    return pa.table(
        {
            "norm_url": pa.array([normalize_url(u) for u in urls], pa.string()),
            "url": batch["url"],
        }
    )


def q_url_dedup(sf_dir: str) -> rd.Dataset:
    """URL-canonicalization dedup — the first dedup step of a web corpus
    pipeline: canonicalize (functions/urlnorm.py), then one hash groupby
    on the canonical key keeping the lexicographically-first raw url.
    Only (norm_url, url) string pairs shuffle; payloads never move."""
    from ray.data.aggregate import Min

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return (
        rd.read_parquet(pages_dir, columns=["url"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "url_variants_batch"),
            batch_format="pyarrow",
        )
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "url_norm_batch"),
            batch_format="pyarrow",
        )
        .groupby("norm_url")
        .aggregate(Count(alias_name="n_dups"), Min("url", alias_name="keep_url"))
    )


def url_template_batch(batch: pa.Table) -> pa.Table:
    from ..functions.urlnorm import url_template

    return pa.table(
        {
            "template": pa.array(
                [url_template(u) for u in batch["url"].to_pylist()], pa.string()
            )
        }
    )


def q_url_template_topk(sf_dir: str) -> rd.Dataset:
    """URL-pattern mining: top-20 structural URL templates (host + path,
    digit runs collapsed) by page count — the sitemap/crawler-trap
    analysis every crawl triage runs. Map -> template-keyed Count ->
    top-k sort; only template strings shuffle. Deterministic tie order
    (n DESC, template ASC)."""
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return (
        rd.read_parquet(pages_dir, columns=["url"])
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_extract", "url_template_batch"
            ),
            batch_format="pyarrow",
        )
        .groupby("template")
        .aggregate(Count(alias_name="n_pages"))
        .sort(["n_pages", "template"], descending=[True, False])
        .limit(20)
    )


def lines_explode(batch: pa.Table) -> pa.Table:
    """One row per kept, non-empty HTML block: the corpus's line table.
    Only (url, md5, position, length) leave the task — never line text."""
    from ..functions.lines import kept_line_rows, pos_key

    urls, md5s, ncs, keys = [], [], [], []
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        for bid, h, n in kept_line_rows(payload):
            urls.append(url)
            md5s.append(h)
            ncs.append(n)
            keys.append(pos_key(url, bid))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "line_md5": pa.array(md5s, pa.string()),
            "n_chars": pa.array(ncs, pa.int64()),
            "pos_key": pa.array(keys, pa.string()),
        }
    )


def line_win_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (line_md5, min pos_key) row per distinct
    hash, so the winner groupby shuffles <= distinct-lines-per-block rows
    (boilerplate lines collapse map-side — the giant-group guard: a line
    occurring on every page contributes ONE row per block, not one per
    occurrence)."""
    g = batch.group_by(["line_md5"]).aggregate([("pos_key", "min")])
    return select_rename(g, line_md5="line_md5", keep_key="pos_key_min")


def line_dedup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-url partial of the final accounting."""
    removed = pc.not_equal(batch["pos_key"], batch["keep_key"])
    t = pa.table(
        {
            "url": batch["url"],
            "n_lines": pa.array([1] * len(batch), pa.int64()),
            "n_removed": pc.cast(removed, pa.int64()),
            "chars_kept": pc.if_else(
                removed, pa.scalar(0, pa.int64()), batch["n_chars"]
            ),
        }
    )
    g = t.group_by(["url"]).aggregate(
        [("n_lines", "sum"), ("n_removed", "sum"), ("chars_kept", "sum")]
    )
    return select_rename(
        g,
        url="url",
        n_lines="n_lines_sum",
        n_removed="n_removed_sum",
        chars_kept="chars_kept_sum",
    )


def _lines_table(sf_dir: str) -> rd.Dataset:
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "lines_explode"),
        batch_format="pyarrow",
    )


def _line_exact_accounting(lines_ds: rd.Dataset, n_rows: int) -> rd.Dataset:
    """The exact first-occurrence accounting path, shared by the full-
    corpus plan (q_line_dedup) and the Bloom-hit subset
    (q_bloom_line_dedup): per-batch min combiner -> line_md5 groupby Min
    (winner) -> hash join back -> per-batch per-url partial. The join
    width derives from THE INPUT's row count — sizing a hit subset by
    the full corpus would hash a tiny key set across mostly-empty
    partitions."""
    from ray.data.aggregate import Min

    from ..joins import partitions_for_rows, safe_join

    winners = (
        lines_ds.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "line_win_partial"),
            batch_format="pyarrow",
        )
        .groupby("line_md5")
        .aggregate(Min("keep_key", alias_name="keep_key"))
        .rename_columns({"line_md5": "line_md5_r"})
    )
    joined = safe_join(
        lines_ds, winners, on=("line_md5",), right_on=("line_md5_r",),
        assume_non_empty=True,  # callers guarantee a non-empty line set
        num_partitions=partitions_for_rows(n_rows),
    )
    return joined.map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "line_dedup_partial"),
        batch_format="pyarrow",
    )


def _line_url_rollup(acc: rd.Dataset) -> rd.Dataset:
    return acc.groupby("url").aggregate(
        Sum("n_lines", alias_name="n_lines"),
        Sum("n_removed", alias_name="n_removed"),
        Sum("chars_kept", alias_name="chars_kept"),
    )


def q_line_dedup(sf_dir: str) -> rd.Dataset:
    """C4-style corpus-wide LINE dedup over the extracted web text: a kept
    HTML block whose whitespace-collapsed text already occurred earlier in
    the corpus (min (url, block_id) order) is boilerplate and is removed;
    per url report lines seen, lines removed, and chars surviving.

    Plan (all slim string/int columns; payloads never shuffle):
      explode -> per-batch min combiner -> line_md5 groupby Min (winner)
      -> hash join winners back -> per-batch per-url partial -> url Sum.
    100 TB: the winner table is |distinct lines| rows; hot boilerplate
    lines pre-collapse map-side in BOTH the combiner and the final
    partial, so no task ever holds a full dup group."""
    # materialized: consumed twice (winner aggregate + join probe), and
    # the FREE row count prices the streaming join
    lines = _lines_table(sf_dir).materialize()
    return _line_url_rollup(_line_exact_accounting(lines, lines.count()))


def line_unique_partial(batch: pa.Table) -> pa.Table:
    """Accounting partial for PROVABLY-unique lines (Bloom misses): every
    such line keeps itself, so keep_key == pos_key by construction."""
    return line_dedup_partial(batch.append_column("keep_key", batch["pos_key"]))


def q_bloom_line_dedup(sf_dir: str) -> rd.Dataset:
    """line_dedup with a Dolma/BFF-style duplicate-Bloom prefilter — SAME
    RESULT, different physical plan (the oracle is literally line_dedup's):

      pass 1: per-block (once, twice) Bloom pair, associative fold on the
              driver (O(m_bits) memory regardless of corpus size);
      pass 2: ONE probe pass stamps a dup_flag column; misses are
              provably unique -> map-side accounting, NO shuffle; hits
              (true dups + fp_rate * uniques) run the shared exact
              min-winner path, which removes the false positives — with
              its join width sized by the HIT count, and skipped
              entirely on a hit-free corpus.

    100 TB: the exact path's exchanges shrink from |all lines| to
    |duplicated lines| + fp_rate * |unique lines| — on mostly-unique web
    corpora that is the bulk of the shuffle gone for the price of one
    extra streaming pass and a broadcast bitmap (m_bits sized to the
    expected distinct-line count; 2^20 here for the test corpus)."""
    from ..functions.bloom import DEFAULT_K, DEFAULT_M_BITS, build_dup_bloom

    lines = _lines_table(sf_dir).materialize()  # bloom build + probe
    twice_ref = ray.put(build_dup_bloom(lines, "line_md5"))
    probed = lines.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.functions.bloom",
            "dup_flag_batch",
            col="line_md5",
            bloom_ref=twice_ref,
            m_bits=DEFAULT_M_BITS,
            k=DEFAULT_K,
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed 3x: hit count, hit path, miss path
    n_hits = int(probed.sum("dup_flag") or 0)
    acc_uniq = probed.map_batches(
        remote_fn("khl_pdf_ocr_ray.functions.bloom", "flag_take", keep_hits=False),
        batch_format="pyarrow",
    ).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "line_unique_partial"),
        batch_format="pyarrow",
    )
    if n_hits == 0:  # dup-free corpus: no exact path at all
        return _line_url_rollup(acc_uniq)
    hits = probed.map_batches(
        remote_fn("khl_pdf_ocr_ray.functions.bloom", "flag_take", keep_hits=True),
        batch_format="pyarrow",
    )
    return _line_url_rollup(
        _line_exact_accounting(hits, n_hits).union(acc_uniq)
    )


# --- url blocklist filter -------------------------------------------------------
def url_block_batch(batch: pa.Table) -> pa.Table:
    """Per-batch blocklist verdicts: (host, kept, blocked) combiner rows.
    The blocklist is a broadcast set probe (functions/graph.py holds the
    shared rule) — the standard robots/spam domain filter; no shuffle
    touches page rows, only per-(host, batch) counts."""
    from ..functions.graph import block_verdict

    agg: dict = {}
    for u in batch["url"].to_pylist():
        h, blocked = block_verdict(u)
        k, b = agg.get(h, (0, 0))
        agg[h] = (k + (0 if blocked else 1), b + (1 if blocked else 0))
    hosts = sorted(agg)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "kept": pa.array([agg[h][0] for h in hosts], pa.int64()),
            "blocked": pa.array([agg[h][1] for h in hosts], pa.int64()),
        }
    )


def q_url_blocklist(sf_dir: str) -> rd.Dataset:
    """Crawl blocklist filtering: pages dropped by a broadcast host/path
    blocklist, reported per host (kept vs blocked counts). The filter
    itself is map-only (at 100 TB the blocklist is a ray.put set or a
    Bloom filter per functions/bloom.py); the tiny per-host aggregate is
    the only exchange."""
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return (
        rd.read_parquet(pages_dir, columns=["url"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "url_block_batch"),
            batch_format="pyarrow",
        )
        .groupby("host")
        .aggregate(
            Sum("kept", alias_name="kept"), Sum("blocked", alias_name="blocked")
        )
    )


def pr_edges_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (src, dst, w) edge combiner over the planted host links."""
    from collections import Counter

    from ..functions.graph import host_edge

    c = Counter(host_edge(u) for u in batch["url"].to_pylist())
    ks = sorted(c)
    return pa.table(
        {
            "src": pa.array([k[0] for k in ks], pa.string()),
            "dst": pa.array([k[1] for k in ks], pa.string()),
            "w": pa.array([c[k] for k in ks], pa.int64()),
        }
    )


def pr_contrib_partial(batch: pa.Table) -> pa.Table:
    """Joined (edge, src rank) rows -> per-batch per-dst damped-mass sums
    (the shared pr_contrib formula per edge, then an integer combiner)."""
    from ..functions.graph import pr_contrib

    sums: dict = {}
    for d, r, w, wo in zip(
        batch["dst"].to_pylist(),
        batch["r"].to_pylist(),
        batch["w"].to_pylist(),
        batch["wout"].to_pylist(),
    ):
        sums[d] = sums.get(d, 0) + pr_contrib(r, w, wo)
    ks = sorted(sums)
    return pa.table(
        {
            "dst": pa.array(ks, pa.string()),
            "c": pa.array([sums[k] for k in ks], pa.int64()),
        }
    )


def pr_rank_coalesce(batch: pa.Table) -> pa.Table:
    """(host LEFT JOIN incoming mass) -> next rank = teleport + mass."""
    from ..functions.graph import PR_TELEPORT

    c = batch["c"].to_pylist()
    return pa.table(
        {
            "host": batch["host"],
            "r": pa.array(
                [PR_TELEPORT + (v or 0) for v in c], pa.int64()
            ),
        }
    )


def pr_contrib_broadcast(batch: pa.Table, rank_ref) -> pa.Table:
    """pr_contrib_partial with the src rank probed from a BROADCAST
    host->rank map instead of a join column (small-|hosts| rounds)."""
    import ray

    from ..functions.graph import pr_contrib

    rmap = ray.get(rank_ref) if not isinstance(rank_ref, dict) else rank_ref
    sums: dict = {}
    for s, d, w, wo in zip(
        batch["src"].to_pylist(),
        batch["dst"].to_pylist(),
        batch["w"].to_pylist(),
        batch["wout"].to_pylist(),
    ):
        sums[d] = sums.get(d, 0) + pr_contrib(rmap[s], w, wo)
    ks = sorted(sums)
    return pa.table(
        {
            "dst": pa.array(ks, pa.string()),
            "c": pa.array([sums[k] for k in ks], pa.int64()),
        }
    )


def pr_rank_broadcast(batch: pa.Table, mass_ref) -> pa.Table:
    """pr_rank_coalesce with the incoming mass probed from a BROADCAST
    dst->mass map instead of a left join (small-|hosts| rounds)."""
    import ray

    from ..functions.graph import PR_TELEPORT

    mmap = ray.get(mass_ref) if not isinstance(mass_ref, dict) else mass_ref
    hosts = batch["host"].to_pylist()
    return pa.table(
        {
            "host": batch["host"],
            "r": pa.array(
                [PR_TELEPORT + mmap.get(h, 0) for h in hosts], pa.int64()
            ),
        }
    )


def pr_nodes_partial(batch: pa.Table) -> pa.Table:
    hosts = sorted(set(batch["src"].to_pylist()) | set(batch["dst"].to_pylist()))
    return pa.table({"host": pa.array(hosts, pa.string())})


def pr_init_rank(batch: pa.Table) -> pa.Table:
    from ..functions.graph import PR_SCALE

    return batch.select(["host"]).append_column(
        "r", pa.array([PR_SCALE] * len(batch), pa.int64())
    )


def q_host_pagerank(sf_dir: str) -> rd.Dataset:
    """PageRank over the host link graph — the iterative graph-centrality
    operator (Page et al. 1999; crawl prioritization / spam triage in a
    web pipeline). Edges are the deterministic planted outlinks
    (functions/graph.py); the iteration is all int64 fixed-point so any
    partitioning is bit-identical to the sequential twin.

    Plan: per-batch edge combiner -> (src, dst) Sum (the edge table, one
    row per distinct link) -> weighted out-degree aggregate joined back
    once -> PR_ITERS rounds of [rank join on src -> per-batch damped-mass
    combiner -> dst-keyed Sum -> left join onto the node table]. Rank
    state lives in Datasets end-to-end — the driver never holds a
    per-node structure. 100 TB: edges/nodes are host-cardinality tables
    (~10^7 rows for the web), every exchange is slim strings+ints; w and
    rank bounded by corpus pages keeps r*w*85 under int64 for < ~2^30
    pages per host-pair (documented headroom)."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.graph import PR_ITERS
    from ..joins import _max_partitions, partitions_for_rows, safe_join

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    edges = (
        rd.read_parquet(pages_dir, columns=["url"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "pr_edges_partial"),
            batch_format="pyarrow",
        )
        .groupby(["src", "dst"])
        .aggregate(_Sum("w", alias_name="w"))
        .materialize()
    )
    n_edges = edges.count()  # free from materialized metadata
    if n_edges <= PR_BROADCAST_MAX:
        # the EDGE table (host-pair cardinality) fits the broadcast cap:
        # the distributed part of the operator is exactly the
        # corpus-sized reduction above (read -> per-batch edge combiner
        # -> (src, dst) Sum); the iteration over the reduced graph runs
        # on the driver WITH THE SAME KERNELS (bit-identity with the
        # distributed loop by construction; the forced-branch test and
        # the oracle cover it). Same bounded-pull class as the LM
        # vocabulary / cluster_top_terms folds. The join loop below is
        # the web-scale (|hosts| ~ 10^7) path.
        parts = [
            b for b in edges.iter_batches(batch_format="pyarrow") if len(b)
        ]
        et = pa.concat_tables(parts)
        srcs = et["src"].to_pylist()
        wvals = et["w"].to_pylist()
        wout_map: dict = {}
        for s, w in zip(srcs, wvals):
            wout_map[s] = wout_map.get(s, 0) + w
        edges_w_t = et.append_column(
            "wout", pa.array([wout_map[s] for s in srcs], pa.int64())
        )
        hosts_t = pr_nodes_partial(et)
        rt = pr_init_rank(hosts_t)
        rmap = dict(zip(rt["host"].to_pylist(), rt["r"].to_pylist()))
        for _ in range(PR_ITERS):
            ct = pr_contrib_broadcast(edges_w_t, rank_ref=rmap)
            mmap = dict(zip(ct["dst"].to_pylist(), ct["c"].to_pylist()))
            rt = pr_rank_broadcast(hosts_t, mass_ref=mmap)
            rmap = dict(zip(rt["host"].to_pylist(), rt["r"].to_pylist()))
        return rd.from_arrow(rt.rename_columns(["host", "pagerank_fx"]))
    wout = (
        edges.groupby("src")
        .aggregate(_Sum("w", alias_name="wout"))
        .rename_columns({"src": "wsrc"})
    )
    # edges is HOST-PAIR cardinality (tiny): rows-derived sizing collapses
    # to one partition — a byte floor of 8 here cost 9 exchanges x 8
    # near-empty partitions per pagerank run (measured 8 -> 14 s)
    edges_w = safe_join(
        edges, wout, on=("src",), right_on=("wsrc",),
        assume_non_empty=True,  # every page plants one edge
        num_partitions=partitions_for_rows(edges.count()),
    )
    edges_w = edges_w.materialize()  # reused every iteration
    nodes = (
        edges.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "pr_nodes_partial"),
            batch_format="pyarrow",
        )
        .groupby("host")
        .aggregate(Count(alias_name="n_"))
        .select_columns(["host"])
        .materialize()
    )
    # every in-loop table is host- or edge-cardinality and non-empty by
    # construction, so the loop calls Dataset.join DIRECTLY with a
    # partition count derived ONCE from the materialized metadata —
    # safe_join's per-call materialize+count of both sides would add six
    # pipeline barriers per run for information already in hand (measured
    # 11.2 s -> these joins dominated the toy-scale wall)
    n_parts = max(1, min(_max_partitions(), edges_w.count() // 4096))
    rank = nodes.map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "pr_init_rank"),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(PR_ITERS):
        j = edges_w.join(
            rank.rename_columns({"host": "rhost"}),
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            right_on=("rhost",),
        )
        mass = (
            j.map_batches(
                remote_fn(
                    "khl_pdf_ocr_ray.pipelines.queries_extract", "pr_contrib_partial"
                ),
                batch_format="pyarrow",
            )
            .groupby("dst")
            .aggregate(_Sum("c", alias_name="c"))
        )
        joined = nodes.join(
            mass,
            join_type="left_outer",
            num_partitions=n_parts,
            on=("host",),
            right_on=("dst",),
        )
        rank = joined.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_extract", "pr_rank_coalesce"),
            batch_format="pyarrow",
        ).materialize()  # the iterate working set (cache-the-iterate pattern)
    return rank.rename_columns({"r": "pagerank_fx"})


def ref_team_partial(batch: pa.Table) -> pa.Table:
    """gamesheet rows -> (referee, team, n) co-occurrence cell partials:
    each game contributes every chief referee x {home, away} team."""
    keep = pc.or_(
        pc.equal(batch["engine"], "pdf-text"), pc.equal(batch["engine"], "pdf-ocr")
    )
    b = batch.filter(keep)
    cells: dict = {}
    for refs, th, ta in zip(
        b["ref_main"].to_pylist(),
        b["team_home"].to_pylist(),
        b["team_away"].to_pylist(),
    ):
        for r in refs or []:
            if not r:
                continue
            for team in (th, ta):
                if team:
                    cells[(r, team)] = cells.get((r, team), 0) + 1
    if not cells:
        return pa.table(
            {
                "referee": pa.array([], pa.string()),
                "team": pa.array([], pa.string()),
                "n_games": pa.array([], pa.int64()),
            }
        )
    ks = sorted(cells)
    return pa.table(
        {
            "referee": pa.array([k[0] for k in ks], pa.string()),
            "team": pa.array([k[1] for k in ks], pa.string()),
            "n_games": pa.array([cells[k] for k in ks], pa.int64()),
        }
    )


def q_ref_team_matrix(sf_dir: str) -> rd.Dataset:
    """(referee, team, n_games) — chief-referee x team assignment matrix
    over the extraction surface (officiating-exposure report; the
    entity analogue of the host co-occurrence rollups). Exchange is
    entity-vocabulary-bounded (|referees| x |teams| cells), combined
    map-side; the document payload never leaves the extraction stage."""
    from ray.data.aggregate import Sum

    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_extract", "ref_team_partial"
            ),
            batch_format="pyarrow",
        )
        .groupby(["referee", "team"])
        .aggregate(Sum("n_games", alias_name="n_games"))
    )


EXTRACT_QUERIES = {
    "extract_pages": q_extract_pages,
    "extract_entities": q_extract_entities,
    "ref_team_matrix": q_ref_team_matrix,
    "extract_host_stats": q_extract_host_stats,
    "extract_error_rates": q_extract_error_rates,
    "master_validate": q_master_validate,
    "skew_partition_stats": q_skew_partition_stats,
    "lineage": q_lineage,
    "media_image_features": q_media_image_features,
    "media_audio_features": q_media_audio_features,
    "media_frame_sample": q_media_frame_sample,
    "extract_refs_mode": q_extract_refs_mode,
    "pdf_words": q_pdf_words,
    "extract_blocks": q_extract_blocks,
    "url_dedup": q_url_dedup,
    "url_template_topk": q_url_template_topk,
    "line_dedup": q_line_dedup,
    "bloom_line_dedup": q_bloom_line_dedup,
    "pdf_table_cells": q_pdf_table_cells,
    "host_pagerank": q_host_pagerank,
    "url_blocklist": q_url_blocklist,
}
