"""First-order Markov next-event prediction with a temporal backtest.

The train/eval loop for the markov_transitions model: per user, order
the event stream by (ts, event_id) and split it in time — the pair
(position i -> i+1) trains the model when i+1 <= (n+1)//2 and tests it
otherwise. The model is the global argmax next-type per previous type
over TRAIN pairs (ties broken by next type ASC); accuracy is top-1 hit
rate over TEST pairs, per previous type, in exact integer milli-units.

Output: one row per previous type seen in training
(prev_type, predicted, n_test, n_correct, acc_milli).

Plan / 100 TB notes: ONE per-user ordered fold (groupby.map_groups —
the sessionize exchange class) emits <= 2 * |types|^2 count rows per
user ((prev, next, is_test) cells, the event payload never re-shuffles);
ONE small keyed Sum; the driver folds |types|^2 cells in exact Python
ints (event-type-vocabulary bounded).

Oracle: static SQL — ROW_NUMBER / COUNT windows build the same pairs,
a ROW_NUMBER-over-counts window picks the same argmax.

Reference analogue: /root/reference/app.py has no modeling surface;
brief scope (train/eval-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_markoveval"

_EMPTY = pd.DataFrame(
    {
        "prev": pd.Series([], dtype=object),
        "nxt": pd.Series([], dtype=object),
        "is_test": pd.Series([], dtype=np.int64),
        "n": pd.Series([], dtype=np.int64),
    }
)


def markov_split_pairs_per_user(df: pd.DataFrame) -> pd.DataFrame:
    """One user's events -> (prev, nxt, is_test, n) cell counts."""
    df = df.sort_values(["ts", "event_id"])
    et = df["event_type"].to_numpy()
    n = len(et)
    if n < 2:
        return _EMPTY.copy()
    pos2 = np.arange(2, n + 1, dtype=np.int64)
    out = pd.DataFrame(
        {
            "prev": et[:-1],
            "nxt": et[1:],
            "is_test": (pos2 > (n + 1) // 2).astype(np.int64),
        }
    )
    g = out.groupby(["prev", "nxt", "is_test"], as_index=False).size()
    g = g.rename(columns={"size": "n"})
    g["n"] = g["n"].astype(np.int64)
    return g


def markov_eval_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (prev, nxt, is_test, n) cells -> the eval table."""
    train: dict = {}
    test: dict = {}
    for r in cells.itertuples():
        d = test if int(r.is_test) else train
        d[(r.prev, r.nxt)] = d.get((r.prev, r.nxt), 0) + int(r.n)
    model = {}
    for (prev, nxt), n in train.items():
        cur = model.get(prev)
        # argmax by (count DESC, next ASC)
        if cur is None or (-n, nxt) < (-cur[1], cur[0]):
            model[prev] = (nxt, n)
    out = {"prev_type": [], "predicted": [], "n_test": [],
           "n_correct": [], "acc_milli": []}
    for prev in sorted(model):
        predicted = model[prev][0]
        n_test = sum(
            n for (p, _), n in test.items() if p == prev
        )
        n_correct = test.get((prev, predicted), 0)
        out["prev_type"].append(prev)
        out["predicted"].append(predicted)
        out["n_test"].append(n_test)
        out["n_correct"].append(n_correct)
        out["acc_milli"].append(
            (1000 * n_correct) // n_test if n_test else 0
        )
    return pd.DataFrame(
        {
            "prev_type": out["prev_type"],
            "predicted": out["predicted"],
            "n_test": np.array(out["n_test"], dtype=np.int64),
            "n_correct": np.array(out["n_correct"], dtype=np.int64),
            "acc_milli": np.array(out["acc_milli"], dtype=np.int64),
        }
    )


def q_markov_predict_eval(sf_dir: str) -> pd.DataFrame:
    """(prev_type, predicted, n_test, n_correct, acc_milli)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(
            remote_fn(_QM, "markov_split_pairs_per_user"),
            batch_format="pandas",
        )
        .groupby(["prev", "nxt", "is_test"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2 x |types|^2 rows — vocabulary-bounded
    )
    return markov_eval_finalize(cells)


SQL_MARKOV_PREDICT_EVAL = """
WITH o AS (
  SELECT user_id, event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM events),
pairs AS (
  SELECT a.event_type AS prev, b.event_type AS nxt,
         CASE WHEN b.rn > (a.n + 1) // 2 THEN 1 ELSE 0 END AS is_test
  FROM o a JOIN o b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
tc AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM pairs WHERE is_test = 0 GROUP BY prev, nxt),
model AS (
  SELECT prev, nxt AS predicted
  FROM (SELECT prev, nxt,
               ROW_NUMBER() OVER (PARTITION BY prev
                                  ORDER BY c DESC, nxt ASC) AS r
        FROM tc)
  WHERE r = 1),
te AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM pairs WHERE is_test = 1 GROUP BY prev, nxt)
SELECT m.prev AS prev_type, m.predicted,
       CAST(coalesce(sum(te.c), 0) AS BIGINT) AS n_test,
       CAST(coalesce(sum(CASE WHEN te.nxt = m.predicted THEN te.c
                          ELSE 0 END), 0) AS BIGINT) AS n_correct,
       CAST(CASE WHEN coalesce(sum(te.c), 0) = 0 THEN 0
            ELSE (1000 * sum(CASE WHEN te.nxt = m.predicted THEN te.c
                             ELSE 0 END)) // sum(te.c)
            END AS BIGINT) AS acc_milli
FROM model m LEFT JOIN te ON te.prev = m.prev
GROUP BY m.prev, m.predicted
"""

MARKOVEVAL_QUERIES = {"markov_predict_eval": q_markov_predict_eval}
MARKOVEVAL_ORACLES = {"markov_predict_eval": SQL_MARKOV_PREDICT_EVAL}
