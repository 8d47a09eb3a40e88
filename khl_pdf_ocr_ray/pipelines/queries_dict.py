"""Multi-pattern dictionary tagging (substring scan over documents).

``dictionary_tag``: for every pattern in a fixed dictionary (single
words, multi-word phrases, and absent probes), the number of documents
containing it and the total non-overlapping occurrence count — the
blocklist/PII/keyword-tagging scan shape (FlashText/Aho-Corasick class).
Occurrence semantics are left-to-right NON-overlapping, identical in
pyarrow's ``count_substring`` and DuckDB's replace-length arithmetic
(parity checked on the 'aa' in 'aaa' overlap case).

Plan / 100 TB notes: map-only — one vectorized ``pc.count_substring``
sweep per pattern per batch (text never leaves the scan); per-batch
(pattern, n_docs, n_occ) partials fold through ONE dictionary-sized Sum
exchange. This vectorized per-pattern form is right for config-sized
dictionaries; blocklist-scale dictionaries use ``dictionary_tag_ac``
below — an Aho-Corasick automaton built ONCE per actor (`__init__`,
the D2 actor-pool pattern) with the same output contract, one corpus
pass regardless of pattern count (49x over the per-pattern sweep at
10^4 patterns, BASELINE.md).

Oracle: static SQL — one UNION ALL leg per pattern with
``(length(t) - length(replace(t, pat, ''))) // length(pat)``.

Reference analogue: the reference's header-substring tests
(app.py:198, 247, 281) are single-pattern membership scans; this is
the dictionary-scale generalization.
"""

from __future__ import annotations

import pyarrow as pa

from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_dict"

# fixed dictionary: present words, a phrase, substrings crossing word
# boundaries, and an absent probe (zero-row semantics on both sides)
DICT_PATTERNS = (
    "data",
    "row",
    "column",
    "data row",
    "a r",
    "zz-absent-zz",
)


def dict_tag_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (pattern, n_docs, n_occ) partials."""
    import pyarrow.compute as pc

    text = pc.coalesce(batch["text"], "")
    pats, docs, occ = [], [], []
    for pat in DICT_PATTERNS:
        c = pc.count_substring(text, pat)
        pats.append(pat)
        docs.append(pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0)
        occ.append(pc.sum(pc.cast(c, pa.int64())).as_py() or 0)
    return pa.table(
        {
            "pattern": pa.array(pats, pa.string()),
            "n_docs": pa.array(docs, pa.int64()),
            "n_occ": pa.array(occ, pa.int64()),
        }
    )


def q_dictionary_tag(sf_dir: str) -> "object":
    """(pattern, n_docs, n_occ) — zero-hit patterns present with 0s."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QD, "dict_tag_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("pattern")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occ", alias_name="n_occ"),
        )
    )


def _leg(pat: str) -> str:
    esc = pat.replace("'", "''")
    return f"""
SELECT '{esc}' AS pattern,
       CAST(count(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(occ), 0) AS BIGINT) AS n_occ
FROM (SELECT (length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), '{esc}', '')))
             // length('{esc}') AS occ
      FROM documents)"""


SQL_DICTIONARY_TAG = "\nUNION ALL\n".join(_leg(p) for p in DICT_PATTERNS)

class AhoCorasick:
    """Byte-level Aho-Corasick automaton (goto dicts + fail links).

    Sparse goto (dict per state) rather than a dense 256-wide table so
    memory stays O(total pattern bytes) — a 10^5-pattern blocklist builds
    in a few hundred MB of dicts where a dense table would need
    states x 256 x 4 bytes. The scan is the classic fail-chain walk:
    amortized O(1) transitions per input byte, INDEPENDENT of pattern
    count — the property the per-pattern ``pc.count_substring`` sweep in
    ``dict_tag_partial`` lacks (that one is O(|patterns| x corpus)).

    Occurrence semantics match ``pc.count_substring`` / the DuckDB
    replace-length oracle exactly: per-pattern LEFT-TO-RIGHT
    NON-OVERLAPPING. AC emits matches in increasing end-position order,
    which for a fixed-length pattern is increasing start order, so the
    greedy "accept iff start >= end of last accepted match of the same
    pattern" filter reproduces the non-overlapping count (parity on the
    'aa' in 'aaa' case is in the tests).
    """

    def __init__(self, patterns) -> None:
        self.patterns = [p for p in patterns]
        enc = [p.encode("utf-8") for p in self.patterns]
        # trie build
        goto = [dict()]  # state -> {byte: state}
        out = [[]]       # state -> [(pattern_idx, pattern_byte_len)]
        for pidx, pb in enumerate(enc):
            st = 0
            for b in pb:
                nxt = goto[st].get(b)
                if nxt is None:
                    nxt = len(goto)
                    goto[st][b] = nxt
                    goto.append(dict())
                    out.append([])
                st = nxt
            out[st].append((pidx, len(pb)))
        # BFS fail links; outputs inherit along the fail chain so one
        # state lookup yields every pattern ending here
        from collections import deque

        fail = [0] * len(goto)
        dq = deque()
        for b, s in goto[0].items():
            fail[s] = 0
            dq.append(s)
        while dq:
            r = dq.popleft()
            for b, s in goto[r].items():
                dq.append(s)
                f = fail[r]
                while f and b not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(b, 0) if goto[f].get(b, 0) != s else 0
                if out[fail[s]]:
                    out[s] = out[s] + out[fail[s]]
        self._goto = goto
        self._fail = fail
        self._out = [tuple(o) for o in out]

    def scan_into(self, data: bytes, occ, seen, last_end, touched) -> None:
        """One pass over ``data``; accumulates into the caller's arrays
        (``occ`` global per-pattern occurrence counts; ``seen``/``last_end``
        per-doc scratch reset via ``touched`` so per-doc cost is
        O(matches), not O(|patterns|))."""
        goto = self._goto
        fail = self._fail
        out = self._out
        st = 0
        pos = 0
        for b in data:
            pos += 1
            while st and b not in goto[st]:
                st = fail[st]
            st = goto[st].get(b, 0)
            o = out[st]
            if o:
                for pidx, plen in o:
                    if pos - plen >= last_end[pidx]:
                        occ[pidx] += 1
                        last_end[pidx] = pos
                        if not seen[pidx]:
                            seen[pidx] = True
                            touched.append(pidx)


class DictTagACStage:
    """Actor-pool stage: automaton built ONCE per actor in ``__init__``
    (the D2 pattern), one corpus pass per batch regardless of dictionary
    size. Output contract identical to ``dict_tag_partial``."""

    def __init__(self, patterns=None) -> None:
        self.patterns = list(patterns) if patterns is not None else list(DICT_PATTERNS)
        self.ac = AhoCorasick(self.patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        p = len(self.patterns)
        n_docs = np.zeros(p, dtype=np.int64)
        n_occ = np.zeros(p, dtype=np.int64)
        seen = np.zeros(p, dtype=bool)
        last_end = np.zeros(p, dtype=np.int64)
        texts = pc.coalesce(batch["text"], "")
        for t in texts:
            touched: list = []
            self.ac.scan_into(t.as_py().encode("utf-8"), n_occ, seen, last_end, touched)
            for pidx in touched:
                n_docs[pidx] += 1
                seen[pidx] = False
                last_end[pidx] = 0
            # last_end entries of matched-but-rejected patterns: any pattern
            # with an ACCEPTED match is in touched; a rejected match implies
            # an earlier accepted one, so touched covers every dirty entry
        return pa.table(
            {
                "pattern": pa.array(self.patterns, pa.string()),
                "n_docs": pa.array(n_docs),
                "n_occ": pa.array(n_occ),
            }
        )


def q_dictionary_tag_ac(sf_dir: str) -> "object":
    """Same (pattern, n_docs, n_occ) contract as ``dictionary_tag``,
    computed by the actor-held Aho-Corasick automaton — the 10^5-pattern
    deployment path (one corpus pass, cost independent of dictionary
    size). Hash-equal to ``dictionary_tag`` on the same dictionary."""
    from ray.data.aggregate import Sum

    from ..remote import remote_cls
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_cls(_QD, "DictTagACStage"),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=256,
            concurrency=(2, 8),
            num_cpus=1,
        )
        .groupby("pattern")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occ", alias_name="n_occ"),
        )
    )


DICT_QUERIES = {
    "dictionary_tag": q_dictionary_tag,
    "dictionary_tag_ac": q_dictionary_tag_ac,
}
DICT_ORACLES = {
    "dictionary_tag": SQL_DICTIONARY_TAG,
    "dictionary_tag_ac": SQL_DICTIONARY_TAG,
}
