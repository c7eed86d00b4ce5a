"""Model-twin property tests for the round-7 drafts: each query re-computed
by a brute-force Python reference model on a SEEDED RANDOM corpus (inputs
the sf dirs never produce), same family as test_ppjoin_properties /
test_bootstrap_properties. The oracle hash proves Spark ≡ DuckDB; these
prove both ≡ the textbook definition."""

from __future__ import annotations

import datetime
import math
import random

import pytest

from tests.test_draft_invariants_r7 import _synth_dir
from yelpdatawarehouse_spark.queries.drafts_r7 import (
    AHASH_HAMMING_MAX,
    DRAFTS,
    HOLT_ALPHA,
    HOLT_BETA,
    KCORE_K,
    KCORE_MIN_TOGETHER,
    KCORE_ROUNDS,
    RAKE_STOPWORDS,
    RAKE_TOP_K,
)

_VOCAB = [
    "orbit", "quartz", "meadow", "the", "of", "lantern", "crisp", "and",
    "velvet", "ember", "to", "drift", "marble", "echo", "in", "sable",
]


def _r2(x: float) -> float:
    return math.floor(x * 100 + 0.5) / 100


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def random_basket_dir(tmp_path_factory):
    rng = random.Random(71)
    orders, parts = [], []
    for oid in range(120):
        for p in rng.sample(range(30), rng.randint(2, 6)):
            orders.append(oid)
            parts.append(p)
    return (
        _synth_dir(
            tmp_path_factory,
            {"lineitem": {"l_orderkey": orders, "l_partkey": parts}},
        ),
        list(zip(orders, parts)),
    )


def _model_kcore(rows):
    baskets = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    from collections import Counter

    cnt = Counter()
    for ps in baskets.values():
        sp = sorted(ps)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                cnt[(sp[i], sp[j])] += 1
    edges = {e for e, c in cnt.items() if c >= KCORE_MIN_TOGETHER}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _ in range(KCORE_ROUNDS):
        keep = {n for n, ns in adj.items() if len(ns) >= KCORE_K}
        adj = {
            n: {m for m in ns if m in keep} for n, ns in adj.items() if n in keep
        }
        adj = {n: ns for n, ns in adj.items() if ns}
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_kcore_matches_python_peel(spark, random_basket_dir):
    sf_dir, rows = random_basket_dir
    got = {
        r.part: r.residual_degree
        for r in DRAFTS["g_kcore_parts"][0](spark, sf_dir).collect()
    }
    assert got == _model_kcore(rows)


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def random_revenue_dir(tmp_path_factory):
    rng = random.Random(72)
    days, prices, daily = [], [], {}
    oid = 0
    for d in range(40):
        day = datetime.datetime(1994, 3, 1) + datetime.timedelta(days=d)
        if rng.random() < 0.2:
            continue  # calendar gaps: observed-day series
        for _ in range(rng.randint(1, 4)):
            p = round(rng.uniform(10, 9000), 2)
            days.append(day)
            prices.append(p)
            daily[day.date()] = daily.get(day.date(), 0.0) + p
            oid += 1
    dir_ = _synth_dir(
        tmp_path_factory,
        {
            "orders": {
                "o_orderkey": list(range(len(days))),
                "o_totalprice": prices,
                "o_orderdate": days,
            }
        },
    )
    return dir_, dict(sorted(daily.items()))


def test_holt_matches_python_recurrence(spark, random_revenue_dir):
    sf_dir, daily = random_revenue_dir
    ys = list(daily.values())
    ds = list(daily.keys())
    lvl, tr = [ys[0]], [ys[1] - ys[0] if len(ys) > 1 else 0.0]
    for y in ys[1:]:
        f = lvl[-1] + tr[-1]
        l_new = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * f
        tr.append(HOLT_BETA * (l_new - lvl[-1]) + (1 - HOLT_BETA) * tr[-1])
        lvl.append(l_new)
    got = sorted(
        DRAFTS["t21_holt_linear_daily"][0](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(got) == len(ys)
    for r, d, l, b in zip(got, ds, lvl, tr):
        assert r.day == d.isoformat()
        assert abs(r.level - _r2(l)) < 1e-9, (r, l)
        assert abs(r.trend - _r2(b)) < 1e-9, (r, b)


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def random_text_dir(tmp_path_factory):
    rng = random.Random(73)
    texts = [
        " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(3, 25)))
        for _ in range(60)
    ]
    return (
        _synth_dir(
            tmp_path_factory,
            {
                "documents": {
                    "doc_id": list(range(60)),
                    "text": texts,
                    "lang": ["en"] * 60,
                    "source": [f"s{i % 3}" for i in range(60)],
                    "n_chars": [len(t) for t in texts],
                }
            },
        ),
        texts,
    )


def _model_rake(texts):
    phrases = []  # list of tuple(words)
    for t in texts:
        run = []
        for w in t.split(" "):
            lw = w.lower()
            if lw in RAKE_STOPWORDS or w == "":
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(lw)
        if run:
            phrases.append(tuple(run))
    freq, deg = {}, {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph) - 1
    scored = {}
    occ = {}
    for ph in phrases:
        s = sum(deg[w] / freq[w] for w in ph)
        key = " ".join(ph)
        scored[key] = s
        occ[key] = occ.get(key, 0) + 1
    ranked = sorted(
        scored, key=lambda k: (-math.floor(scored[k] * 1e4 + 0.5), k)
    )[:RAKE_TOP_K]
    return {
        k: (math.floor(scored[k] * 1e4 + 0.5) / 1e4, occ[k]) for k in ranked
    }


def test_rake_matches_python_model(spark, random_text_dir):
    sf_dir, texts = random_text_dir
    got = {
        r.phrase: (r.rake_score, r.n_occurrences)
        for r in DRAFTS["text_rake_keywords"][0](spark, sf_dir).collect()
    }
    want = _model_rake(texts)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-9, (k, got[k], want[k])
        assert got[k][1] == want[k][1]


def _model_ahash(data: bytes) -> int:
    n = len(data)
    stride = n // 32 if n >= 32 else 1
    ncells = 32 if n >= 32 else n
    cells = [data[i * stride] for i in range(ncells)]
    mean = float(sum(cells)) / ncells
    h = 0
    for i, v in enumerate(cells):
        if v >= mean:
            h |= 1 << i
    return h


def test_ahash_pairs_match_bruteforce(spark, random_text_dir):
    sf_dir, texts = random_text_dir
    hashes = {i: _model_ahash(t.encode()) for i, t in enumerate(texts) if t}
    want = {}
    ids = sorted(hashes)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= AHASH_HAMMING_MAX:
                want[(a, b)] = ham
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in DRAFTS["mm_ahash_near_dup_pairs"][0](spark, sf_dir).collect()
    }
    assert got == want


def _model_naive_bayes(texts, sources):
    train = [(t, s) for i, (t, s) in enumerate(zip(texts, sources)) if i % 5]
    test = [
        (i, t, s) for i, (t, s) in enumerate(zip(texts, sources)) if i % 5 == 0
    ]
    classes = sorted({s for _, s in train})
    ndocs = {c: sum(1 for _, s in train if s == c) for c in classes}
    cnt, tot, vocab = {}, {c: 0 for c in classes}, set()
    for t, s in train:
        for w in t.split(" "):
            cnt[(s, w)] = cnt.get((s, w), 0) + 1
            tot[s] += 1
            vocab.add(w)
    V = len(vocab)
    confusion = {}
    for _, t, true_s in test:
        scores = {}
        for c in classes:
            sc = math.log(ndocs[c] / len(train))
            for w in t.split(" "):
                sc += math.log((cnt.get((c, w), 0) + 1) / (tot[c] + V))
            scores[c] = sc
        pred = min(
            classes, key=lambda c: (-math.floor(scores[c] * 1e6 + 0.5), c)
        )
        confusion[(true_s, pred)] = confusion.get((true_s, pred), 0) + 1
    return confusion


def test_naive_bayes_matches_python_model(spark, random_text_dir):
    sf_dir, texts = random_text_dir
    sources = [f"s{i % 3}" for i in range(60)]
    got = {
        (r.true_source, r.pred_source): r.n_docs
        for r in DRAFTS["ml_naive_bayes_confusion"][0](spark, sf_dir).collect()
    }
    assert got == _model_naive_bayes(texts, sources)


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def random_stump_dir(tmp_path_factory):
    rng = random.Random(74)
    qty = [float(rng.randint(1, 12)) for _ in range(300)]
    flag = [
        "R" if rng.random() < (0.8 if q <= 5 else 0.2) else "N" for q in qty
    ]
    dir_ = _synth_dir(
        tmp_path_factory,
        {
            "lineitem": {
                "l_orderkey": list(range(300)),
                "l_partkey": list(range(300)),
                "l_quantity": qty,
                "l_returnflag": flag,
            }
        },
    )
    return dir_, list(zip(qty, flag))


def _model_stump(rows):
    best = None
    thresholds = sorted({q for q, _ in rows})
    n = len(rows)
    for t in thresholds:
        left = [f for q, f in rows if q <= t]
        right = [f for q, f in rows if q > t]
        if not right:
            continue

        def gini(part):
            if not part:
                return 0.0
            p = sum(1 for f in part if f == "R") / len(part)
            return 1 - p * p - (1 - p) * (1 - p)

        g = len(left) / n * gini(left) + len(right) / n * gini(right)
        key = (math.floor(g * 1e6 + 0.5), t)
        if best is None or key < best[0]:
            best = (key, t, g, len(left), len(right))
    return best


def test_stump_matches_python_search(spark, random_stump_dir):
    sf_dir, rows = random_stump_dir
    (got,) = DRAFTS["ml_decision_stump_returns"][0](spark, sf_dir).collect()
    _, t, g, nl, nr = _model_stump(rows)
    assert got.threshold == t
    assert abs(got.split_gini - math.floor(g * 1e6 + 0.5) / 1e6) < 1e-9
    assert got.n_left == nl and got.n_right == nr


def test_kalman_matches_python_recurrence(spark, random_revenue_dir):
    from yelpdatawarehouse_spark.queries.drafts_r7 import KALMAN_Q, KALMAN_R

    sf_dir, daily = random_revenue_dir
    ys = list(daily.values())
    x, p = [ys[0]], [float(KALMAN_R)]
    ks = [1.0]
    for y in ys[1:]:
        pm = p[-1] + KALMAN_Q
        k = pm / (pm + KALMAN_R)
        x.append(x[-1] + k * (y - x[-1]))
        p.append((1 - k) * pm)
        ks.append(k)
    got = sorted(
        DRAFTS["t25_kalman_local_level"][0](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(got) == len(ys)
    for r, xe, pe, ke in zip(got, x, p, ks):
        assert abs(r.level_estimate - _r2(xe)) < 1e-9
        assert abs(r.error_variance - _r2(pe)) < 1e-9
        assert abs(r.kalman_gain - math.floor(ke * 1e6 + 0.5) / 1e6) < 1e-9


def test_boosting_round_matches_python_model(spark, random_stump_dir):
    sf_dir, rows = random_stump_dir
    (got,) = DRAFTS["ml_boosting_round_stumps"][0](spark, sf_dir).collect()

    def weighted_best(wrows):
        best = None
        n = sum(w for _, _, w in wrows)
        for t in sorted({q for q, _, _ in wrows}):
            left = [(f, w) for q, f, w in wrows if q <= t]
            right = [(f, w) for q, f, w in wrows if q > t]
            nl = sum(w for _, w in left)
            nr = sum(w for _, w in right)
            if nr == 0 or nl == 0:
                continue

            def gini(part, tot):
                p = sum(w for f, w in part if f == "R") / tot
                return 1 - p * p - (1 - p) * (1 - p)

            g = nl / n * gini(left, nl) + nr / n * gini(right, nr)
            key = (math.floor(g * 1e6 + 0.5), t)
            if best is None or key < best[0]:
                best = (key, t, g, left, right)
        return best

    w1 = [(q, f, 1) for q, f in rows]
    _, t1, g1, left, right = weighted_best(w1)
    left_r = 2 * sum(w for f, w in left if f == "R") >= sum(w for _, w in left)
    right_r = 2 * sum(w for f, w in right if f == "R") >= sum(w for _, w in right)
    mis = [
        (q, f)
        for q, f in rows
        if (q <= t1 and (f == "R") != left_r) or (q > t1 and (f == "R") != right_r)
    ]
    w2 = [
        (q, f, 2 if ((q <= t1 and (f == "R") != left_r)
                     or (q > t1 and (f == "R") != right_r)) else 1)
        for q, f in rows
    ]
    _, t2, g2, _, _ = weighted_best(w2)
    assert got.r1_threshold == t1
    assert abs(got.r1_gini - math.floor(g1 * 1e6 + 0.5) / 1e6) < 1e-9
    assert got.r1_left_label == ("R" if left_r else "N")
    assert got.r1_right_label == ("R" if right_r else "N")
    assert got.n_upweighted == len(mis)
    assert got.r2_threshold == t2
    assert abs(got.r2_weighted_gini - math.floor(g2 * 1e6 + 0.5) / 1e6) < 1e-9
