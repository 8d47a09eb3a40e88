"""Deterministic synthetic corpus: Common-Crawl-style pages + master lists.

Builds the engine's input table (BASELINE.json input_hint schema:
``url, warc_ts, html:binary, text, lang``) from the driver's read-only
``documents.parquet`` — fully deterministic (string-seeded ``random.Random``,
no wall clock, no network), so tests / oracle / bench all see identical
bytes for identical parameters (FIXTURES.md F1).

Payload mix per (doc_id, rep), by a stable hash:
  ~70%  synthetic HTML (nav/header/footer boilerplate + <article> content)
  ~15%  WBOX gamesheets with a text layer (two-column layout, CAPS team
        names, date/time, referee header + 4 names, goalie sections with
        С/Р flags, "Звено" terminator — exercising app.py:138-300 paths)
  ~10%  WBOX *scanned* gamesheets (empty text layer -> OCR fallback path)
  ~5%   corrupt bytes (error-row path, app.py:398-401 analogue)

Master-name side tables mirror the reference's referees_master.csv /
players_master.csv shape (50 + 664 canonical "Фамилия Имя" rows) but are
generated, not copied.
"""

from __future__ import annotations

import random
import zlib
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from .wordbox import encode_wbox

SEED = 42
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

# --- deterministic Cyrillic name pools --------------------------------------
_SUR_STEMS = [
    "Иван", "Петр", "Сидор", "Смирн", "Кузнец", "Поп", "Васильев", "Михайл",
    "Новик", "Фёдор", "Мороз", "Волк", "Сокол", "Лебед", "Козл", "Орл",
    "Зайц", "Павл", "Семён", "Голуб", "Бел", "Черн", "Красн", "Зелен",
    "Серебрян", "Золот", "Камен", "Лесн", "Речн", "Степан", "Медвед",
    "Соловь", "Виногр", "Богдан", "Воробь", "Щук", "Карп", "Ершов",
]
_SUR_SUFFIXES = ["ов", "ев", "ин", "кин", "цов", "ский", "енко"]
_FIRST_NAMES = [
    "Иван", "Пётр", "Олег", "Дмитрий", "Алексей", "Семён", "Никита",
    "Андрей", "Максим", "Егор", "Павел", "Роман", "Сергей", "Антон",
    "Виктор", "Глеб", "Артём", "Кирилл", "Денис", "Фёдор",
]
_TEAMS = [
    "ХК АВАНГАРД", "ХК ДИНАМО МОСКВА", "ХК СПАРТАК", "ХК ТОРПЕДО",
    "ХК МЕТАЛЛУРГ", "ХК САЛАВАТ ЮЛАЕВ", "ХК АК БАРС КАЗАНЬ", "ХК ТРАКТОР",
    "ХК СИБИРЬ", "ХК СЕВЕРСТАЛЬ", "ХК ЛОКОМОТИВ", "ХК АВТОМОБИЛИСТ",
    "ХК ВИТЯЗЬ МОСКВА", "ХК АДМИРАЛ ВЛАДИВОСТОК", "ХК БАРЫС АСТАНА",
    "ХК НЕФТЕХИМИК",
]


def surname_pool() -> List[str]:
    """All stem x suffix combinations, deterministic order (266 surnames)."""
    return [s + suf for s in _SUR_STEMS for suf in _SUR_SUFFIXES]


def full_name_pool() -> List[str]:
    """Deterministic '<Фамилия> <Имя>' pool (266*20 combos, cycled)."""
    return [f"{s} {f}" for s in surname_pool() for f in _FIRST_NAMES]


def master_lookup_table() -> pa.Table:
    """Broadcast side table analogous to the reference's master CSVs
    (SURVEY.md §2.1 S5 / §2.4 J1): 50 referees + 664 players."""
    pool = full_name_pool()
    names = pool[:50] + pool[50 : 50 + 664]
    kinds = ["referee"] * 50 + ["player"] * 664
    return pa.table({"name": names, "kind": kinds})


def _stable_hash(*parts) -> int:
    return zlib.crc32(":".join(str(p) for p in parts).encode("utf-8"))


def _rng(*parts) -> random.Random:
    return random.Random(":".join(str(p) for p in parts))


# --- HTML page --------------------------------------------------------------
def make_html_table(rng: random.Random) -> str:
    """A small deterministic data table (~35% of HTML pages carry one):
    one <th> header row + 2-4 body rows x 2-4 cols. Cells are short
    (< the block scorer's min_text_len), so the main-text extraction is
    unaffected; the table surface is exercised by html_table_cells."""
    ncols = rng.randint(2, 4)
    nrows = rng.randint(2, 4)
    head = "".join(f"<th>col {c}</th>" for c in range(ncols))
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>item {r}.{c} v{rng.randint(0, 99)}</td>" for c in range(ncols)
        )
        + "</tr>"
        for r in range(nrows)
    )
    return f'<table class="data"><tr>{head}</tr>{body}</table>\n'


def make_html_page(rng: random.Random, doc_text: str, title: str) -> str:
    words = doc_text.split()
    paras: List[str] = []
    i = 0
    while i < len(words):
        k = rng.randint(10, 22)
        paras.append(" ".join(words[i : i + k]))
        i += k
    nav_items = "".join(
        f'<li><a href="/s{j}">section {j}</a></li>' for j in range(rng.randint(3, 7))
    )
    related = " ".join(
        f'<a href="/r{j}">related item {j}</a>' for j in range(rng.randint(4, 9))
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    table = make_html_table(rng) if rng.random() < 0.35 else ""
    ad = "<p>ad</p>" if rng.random() < 0.5 else ""
    return (
        "<!doctype html>\n<html><head><title>"
        + title
        + '</title><style>body{margin:0}</style><script>var x=1;</script></head>\n'
        + f"<body>\n<header><h1>{title} portal</h1></header>\n"
        + f"<nav><ul>{nav_items}</ul></nav>\n"
        + f'<div class="main"><article>\n<h2>{title} article heading text</h2>\n'
        + body_paras
        + f"\n{table}{ad}<div class=\"links\">{related}</div>\n</article></div>\n"
        + '<aside><p>subscribe to our newsletter today</p></aside>\n'
        + f"<footer><p>copyright {rng.randint(2019, 2025)} example press</p></footer>\n"
        + "</body></html>"
    )


# --- WBOX gamesheet ---------------------------------------------------------
PAGE_W, PAGE_H = 595.0, 842.0
LEFT_X0, LEFT_XMAX = 40.0, 300.0
RIGHT_X0, RIGHT_XMAX = 320.0, 580.0


def _put_line(words: List, y: float, x0: float, xmax: float, tokens: List[str]) -> None:
    x = x0
    for t in tokens:
        words.append((y, min(x, xmax), t))
        x += 10.0 + 5.5 * len(t)


def make_gamesheet(rng: random.Random, uid: str) -> Dict:
    """Two-column KHL-style game sheet as word boxes (FIXTURES.md F1).

    Returns {"words": [...], "expect": {...}} — `expect` carries the planted
    entity values for assertion-style tests. Left-column padding guarantees
    the reference's upper-median x split assigns every word to its intended
    column (app.py:129-132 semantics verified at generation time).
    """
    pool = full_name_pool()
    refs = [pool[rng.randrange(50)] for _ in range(4)]
    while len({*refs}) < 4:  # distinct referees
        refs = [pool[rng.randrange(50)] for _ in range(4)]
    n_gk = rng.randint(1, 3)
    gk_home = [pool[50 + rng.randrange(664)] for _ in range(n_gk)]
    gk_away = [pool[50 + rng.randrange(664)] for _ in range(n_gk)]
    flags = ["С", "Р", ""]
    gk_home_flags = [flags[rng.randrange(3)] for _ in gk_home]
    gk_away_flags = [flags[rng.randrange(3)] for _ in gk_away]
    home = _TEAMS[rng.randrange(len(_TEAMS))]
    away = _TEAMS[rng.randrange(len(_TEAMS))]
    while away == home:
        away = _TEAMS[rng.randrange(len(_TEAMS))]
    date = f"{rng.randint(1, 28):02d}.{rng.randint(1, 12):02d}.{rng.randint(2020, 2025)}"
    time_msk = f"{rng.randint(12, 22):02d}:{rng.choice([0, 15, 30, 45]):02d}"

    left: List[Tuple[float, float, str]] = []
    right: List[Tuple[float, float, str]] = []

    # header zone (mixed-case so team CAPS lines win the top-quarter scan)
    _put_line(left, 40.0, LEFT_X0, LEFT_XMAX, ["Протокол", "матча", "№", uid])
    _put_line(left, 60.0, LEFT_X0, LEFT_XMAX, [date, time_msk, "Москва"])
    _put_line(left, 90.0, LEFT_X0, LEFT_XMAX, home.split())
    _put_line(right, 90.0, RIGHT_X0, RIGHT_XMAX, away.split())

    # referee header + names (one reconstructed line must hold BOTH headers)
    _put_line(left, 150.0, LEFT_X0, LEFT_XMAX, ["Главный", "судья"])
    _put_line(right, 150.0, RIGHT_X0, RIGHT_XMAX, ["Линейный", "судья"])
    ref_tokens: List[str] = []
    for nm in refs:
        ref_tokens.extend(nm.split())
    if rng.random() < 0.3:
        ref_tokens += ["Обновлено", date]
    _put_line(left, 162.0, LEFT_X0, LEFT_XMAX, ref_tokens[: len(ref_tokens) // 2])
    _put_line(right, 162.0, RIGHT_X0, RIGHT_XMAX, ref_tokens[len(ref_tokens) // 2 :])

    # goalie sections per column, then a lineup terminator
    for col_words, x0, xmax, gks, fl in (
        (left, LEFT_X0, LEFT_XMAX, gk_home, gk_home_flags),
        (right, RIGHT_X0, RIGHT_XMAX, gk_away, gk_away_flags),
    ):
        _put_line(col_words, 200.0, x0, xmax, ["Вратари"])
        y = 212.0
        for nm, f in zip(gks, fl):
            row = [str(rng.randint(1, 99))] + nm.split() + ([f] if f else [])
            _put_line(col_words, y, x0, xmax, row)
            y += 12.0
        _put_line(col_words, 260.0, x0, xmax, ["Звено", "1"])
        y = 272.0
        for _ in range(rng.randint(2, 4)):
            nm = pool[50 + rng.randrange(664)]
            _put_line(col_words, y, x0, xmax, [str(rng.randint(1, 99))] + nm.split())
            y += 12.0

    # body filler spreads the y-range (team scan uses the top quarter)
    y = 420.0
    while y < 820.0:
        _put_line(left, y, LEFT_X0, LEFT_XMAX, ["стат" + str(int(y)), "дом"])
        _put_line(right, y, RIGHT_X0, RIGHT_XMAX, ["стат" + str(int(y)), "гост"])
        y += 16.0

    # pad the left column at x == LEFT_XMAX until the upper-median x split
    # reproduces the intended assignment (see app.py:129-132)
    def split_ok(ws_left, ws_right) -> bool:
        xs = sorted(x for _y, x, _t in ws_left + ws_right)
        mid = xs[len(xs) // 2]
        return all(x <= mid for _y, x, _t in ws_left) and all(
            x > mid for _y, x, _t in ws_right
        )

    pad_y = 421.0
    guard = 0
    while not split_ok(left, right):
        left.append((pad_y, LEFT_XMAX, "поле"))
        pad_y += 16.0
        guard += 1
        if guard > 2000:  # pragma: no cover
            raise RuntimeError("gamesheet split padding did not converge")

    words = left + right
    return {
        "words": words,
        "expect": {
            "date": date,
            "time_msk": time_msk,
            "home": home,
            "away": away,
            "ref_main": refs[:2],
            "ref_linesmen": refs[2:4],
            "gk_home": gk_home,
            "gk_away": gk_away,
        },
    }


# --- pages table ------------------------------------------------------------
HOT_HOST = "hot.example.com"


def page_row(
    doc_id: int,
    rep: int,
    doc_text: str,
    doc_lang: str,
    seed: int = SEED,
    giants_per_mille: int = 0,
) -> Dict:
    """One deterministic page row for (doc_id, rep).

    ``giants_per_mille`` > 0 turns ~that fraction of rows into giant
    documents (content repeated ~100x -> p99 size ~100x median; the
    FIXTURES.md size-skew variant for repartition/straggler tests)."""
    rng = _rng("page", seed, doc_id, rep)
    if giants_per_mille and _stable_hash("giant", seed, doc_id, rep) % 1000 < giants_per_mille:
        doc_text = " ".join([doc_text] * 100)
    h = _stable_hash("mix", seed, doc_id, rep) % 100
    hot = _stable_hash("host", seed, doc_id, rep) % 100 < 30
    host = HOT_HOST if hot else f"site{_stable_hash('site', seed, doc_id) % 40}.example.org"
    if 70 <= h < 95:
        # gamesheet rows carry the reference's URL shape (app.py:49-58) so
        # the season/uid envelope columns are exercised end-to-end
        season = 2023 + doc_id % 3
        url = f"https://{host}/{season}/{doc_id}{rep}/game-{doc_id}{rep}-start-ru.pdf"
    else:
        url = f"https://{host}/p/{doc_id}-{rep}"
    ts = EPOCH_US + (doc_id * 7919 + rep * 131) * 1_000_000
    # rep > 0 rows perturb the text slightly -> realistic near-duplicates
    text = doc_text if rep == 0 else f"{doc_text} variant {rep}"
    if h < 70:
        payload = make_html_page(rng, text, f"doc {doc_id} rev {rep}").encode("utf-8")
        lang, kind = doc_lang, "html"
    elif h < 85:
        sheet = make_gamesheet(rng, f"{doc_id}{rep}")
        payload = encode_wbox([{"width": PAGE_W, "height": PAGE_H, "words": sheet["words"]}])
        lang, kind = "ru", "wbox"
    elif h < 88:
        # REAL %PDF- bytes (sources/minipdf.build_pdf): the pipeline's
        # application/pdf branch runs end-to-end on these rows
        from .minipdf import build_pdf

        sheet = make_gamesheet(rng, f"{doc_id}{rep}")
        payload = build_pdf(
            [sheet["words"]], width=PAGE_W, height=PAGE_H, compress=(doc_id % 2 == 0)
        )
        lang, kind = "ru", "pdf"
    elif h < 95:
        sheet = make_gamesheet(rng, f"{doc_id}{rep}")
        payload = encode_wbox(
            [{"width": PAGE_W, "height": PAGE_H, "words": [], "raster_words": sheet["words"]}]
        )
        lang, kind = "ru", "wbox-scanned"
    else:
        payload = bytes([1, 3, 5, 7]) + rng.randbytes(64)
        lang, kind = doc_lang, "corrupt"
    pre_text = text if _stable_hash("pre", seed, doc_id, rep) % 2 == 0 else None
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": pre_text,
        "lang": lang,
        "_kind": kind,  # generation-only debug column; dropped from output
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_from_documents_batch(
    batch: pa.Table,
    repeat: int = 1,
    seed: int = SEED,
    keep_kind: bool = False,
    giants_per_mille: int = 0,
) -> pa.Table:
    """map_batches body: documents rows -> pages rows (repeat x fan-out)."""
    rows: List[Dict] = []
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        for rep in range(repeat):
            rows.append(
                page_row(int(doc_id), rep, text or "", lang or "und", seed, giants_per_mille)
            )
    cols: Dict[str, list] = {name: [r[name] for r in rows] for name in
                             ("url", "warc_ts", "html", "text", "lang")}
    arrays = [
        pa.array(cols["url"], pa.string()),
        pa.array(cols["warc_ts"], pa.timestamp("us")),
        pa.array(cols["html"], pa.binary()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["lang"], pa.string()),
    ]
    names = list(PAGES_SCHEMA.names)
    if keep_kind:
        arrays.append(pa.array([r["_kind"] for r in rows], pa.string()))
        names.append("_kind")
    return pa.table(dict(zip(names, arrays)))
