"""Kernel tests for the fuzzy master-name canonicalization."""

import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_fuzzy import (
    _codes,
    explode_names_partial,
    master_buckets,
    perturb,
)


def test_perturb_first_e_only():
    assert perturb("Петренко Петр") == "Пётренко Петр"
    assert perturb("Волков Иван") == "Волков Иван"  # no 'е' -> unchanged
    assert len(perturb("Петров Олег")) == len("Петров Олег")  # same length


def test_explode_distinct_and_kinds():
    # third row: a NON-pdf engine carrying names must be filtered out —
    # the kernel applies the oracle's engine IN ('pdf-text','pdf-ocr')
    # instead of trusting other engines to have empty name lists
    batch = pa.table(
        {
            "engine": ["pdf-text", "pdf-ocr", "html"],
            "ref_main": [["Иванов Иван", "Иванов Иван"], [], ["Чужой Судья"]],
            "ref_linesmen": [["Петров Олег"], None, []],
            "gk_home_names": [[], ["Сидоров Глеб"], []],
            "gk_away_names": [["Сидоров Глеб"], [], []],
        }
    )
    out = explode_names_partial(batch).to_pandas()
    got = set(zip(out["kind"], out["name"]))
    assert got == {
        ("referee", perturb("Иванов Иван")),
        ("referee", perturb("Петров Олег")),
        ("goalie", perturb("Сидоров Глеб")),
    }


def test_master_buckets_kinds_and_lengths():
    b = master_buckets()
    assert all(k in ("referee", "goalie") for k, _l in b)
    for (_k, ln), names in b.items():
        assert all(len(n) == ln for n in names)
        assert names == sorted(names)


def test_hamming_codes_matrix():
    import numpy as np

    pool = ["абв", "абг", "ххх"]
    q = np.array([ord(c) for c in "абв"], dtype=np.int64)
    d = (_codes(pool, 3) != q[None, :]).sum(axis=1)
    assert d.tolist() == [0, 1, 3]
