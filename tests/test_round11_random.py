"""Randomized independent-implementation replays for the round-11
operators (slow certification lane): every draw builds a random
fixture, runs the registry query, and checks EXACT equality against a
pure-Python mirror written independently of the Spark/SQL code (same
integer/literal conventions, different implementation).
"""

from __future__ import annotations

import datetime
import hashlib
import math
import random

import pytest

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

pytestmark = pytest.mark.slow  # certification lane (pytest.ini)

REG = build_registry()
_write = write_fixture

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)
LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, "
    "l_quantity double, l_shipdate timestamp"
)
SUP_SCHEMA = "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_US_PER_DAY = 86_400_000_000


def _ts(day: int, hour: int = 0, minute: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1 + (day - 1) // 28, 1 + (day - 1) % 28, hour, minute)


def _dnum(dt: datetime.datetime) -> int:
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) // _US_PER_DAY


# ---- shared pure-python mirrors -------------------------------------


def _p_two(az: float) -> float:
    d = (0.0498673470, 0.0211410061, 0.0032776263, 0.0000380036,
         0.0000488906, 0.0000053830)
    base = 1.0
    for i, c in enumerate(d):
        base += c * az ** (i + 1)
    b2 = base * base
    b4 = b2 * b2
    b8 = b4 * b4
    return 1.0 / (b8 * b8)


def _welch_z(xs_pre: list[int], xs_post: list[int]):
    """z from integer-cent moments, mirroring the query's one double
    chain (na/nb > 1 and se2 > 0 guards)."""
    na, nb = len(xs_pre), len(xs_post)
    if na < 2 or nb < 2:
        return None
    sa1, sa2 = float(sum(xs_pre)), float(sum(x * x for x in xs_pre))
    sb1, sb2 = float(sum(xs_post)), float(sum(x * x for x in xs_post))
    va = (sa2 - sa1 * sa1 / na) / (na - 1)
    vb = (sb2 - sb1 * sb1 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    if not se2 > 0:
        return None
    return (sa1 / na - sb1 / nb) / math.sqrt(se2)


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


# ---- stats_bh_fdr -----------------------------------------------------


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_bh_fdr_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    types = [f"t{i}" for i in range(rng.randint(3, 6))]
    rows, eid = [], 0
    per_type: dict[str, list[tuple[int, int]]] = {t: [] for t in types}
    for t in types:
        shift = rng.choice([0.0, 0.0, rng.uniform(0.5, 3.0)])
        for i in range(rng.randint(8, 40)):
            eid += 1
            day = rng.randint(1, 30)
            v = rng.uniform(1, 10) + (shift if day > 15 else 0.0)
            rows.append((eid, rng.randint(1, 5), _ts(day, i % 24), v, t))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)

    # python mirror: epoch midpoint over ALL events, per-type halves
    us = []
    for r in rows:
        u = int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        us.append(u)
    mid = (min(us) + max(us)) // 2
    zs = {}
    for t in types:
        pre = [_cents(r[3]) for r, u in zip(rows, us) if r[4] == t and u <= mid]
        post = [_cents(r[3]) for r, u in zip(rows, us) if r[4] == t and u > mid]
        z = _welch_z(pre, post)
        if z is not None:
            zs[t] = z
    ps = {t: _p_two(abs(z)) for t, z in zs.items()}
    m = len(ps)
    order = sorted(ps, key=lambda t: (ps[t], t))
    imax = 0
    for i, t in enumerate(order, 1):
        if ps[t] * m <= 0.1 * i:
            imax = i
    expect = {
        t: (
            math.floor(zs[t] * 1000 + 0.5),
            math.floor(ps[t] * 1_000_000 + 0.5),
            i,
            i <= imax,
        )
        for i, t in enumerate(order, 1)
    }
    got = {
        r.event_type: (r.z_milli, r.p_ppm, r.p_rank, r.rejected)
        for r in REG["stats_bh_fdr"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- stats_sprt_conversion -------------------------------------------


@pytest.mark.parametrize("seed", [21, 22])
def test_sprt_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for day in range(1, rng.randint(5, 15)):
        for _ in range(rng.randint(1, 30)):
            eid += 1
            et = "purchase" if rng.random() < rng.choice([0.1, 0.3]) else "click"
            rows.append((eid, 1, _ts(day, eid % 24, eid % 60), 1.0, et))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)

    c1 = math.log(0.25 / 0.20)
    c2 = math.log(0.75 / 0.80)
    A, B = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    by_day: dict[int, list[int]] = {}
    for r in rows:
        by_day.setdefault(_dnum(r[2]), []).append(1 if r[4] == "purchase" else 0)
    n = k = 0
    expect = {}
    for d in sorted(by_day):
        n += len(by_day[d])
        k += sum(by_day[d])
        llr = k * c1 + (n - k) * c2
        day = (datetime.date(1970, 1, 1) + datetime.timedelta(days=d)).isoformat()
        dec = "accept_h1" if llr >= A else ("accept_h0" if llr <= B else "continue")
        expect[day] = (n, k, math.floor(llr * 1000 + 0.5), dec)
    got = {
        r.day: (r.n_cum, r.k_cum, r.llr_milli, r.decision)
        for r in REG["stats_sprt_conversion"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- stats_tost_equivalence ------------------------------------------


def _bucket(uid: int) -> int:
    return int(hashlib.md5(f"{uid}|exp1".encode()).hexdigest()[:15], 16) % 1000


@pytest.mark.parametrize("seed", [31, 32])
def test_tost_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    arm_vals: dict[str, list[int]] = {"c": [], "t": []}
    for _ in range(rng.randint(60, 200)):
        eid += 1
        uid = rng.randint(1, 500)
        arm = "c" if _bucket(uid) < 500 else "t"
        v = rng.uniform(1, 9) + (0.0 if arm == "c" else rng.choice([0.0, 0.05]))
        rows.append((eid, uid, _ts(1 + eid % 20, eid % 24), v, "click"))
        arm_vals[arm].append(_cents(v))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)

    xc, xt = arm_vals["c"], arm_vals["t"]
    nc, nt = len(xc), len(xt)
    mc = sum(xc) / nc / 100.0
    mt = sum(xt) / nt / 100.0
    vc = (sum(x * x for x in xc) - sum(xc) ** 2 / nc) / (nc - 1) / 10000.0
    vt = (sum(x * x for x in xt) - sum(xt) ** 2 / nt) / (nt - 1) / 10000.0
    se2 = vc / nc + vt / nt
    diff = mc - mt
    se = math.sqrt(se2)
    z_lo, z_hi = (diff + 0.10) / se, (diff - 0.10) / se

    def upper(z):
        return _p_two(z) / 2.0 if z >= 0 else 1.0 - _p_two(-z) / 2.0

    p = max(upper(z_lo), 1.0 - upper(z_hi))
    [r] = REG["stats_tost_equivalence"].fn(spark, str(tmp_path)).collect()
    assert (r.n_control, r.n_treatment) == (nc, nt)
    assert r.diff_milli == math.floor(diff * 1000 + 0.5)
    assert r.p_tost_ppm == math.floor(p * 1_000_000 + 0.5)
    assert r.equivalent is (p <= 0.05)


# ---- orders_basket_lift -----------------------------------------------


@pytest.mark.parametrize("seed", [41, 42])
def test_basket_lift_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    baskets: dict[int, set[int]] = {}
    for ok in range(1, rng.randint(10, 30)):
        parts = set(rng.sample(range(10, 30), rng.randint(1, 6)))
        baskets[ok] = parts
        for pk in parts:
            rows.append((ok, pk, 1, "N", 1.0, _ts(1)))
            if rng.random() < 0.3:  # duplicate line must not double-count
                rows.append((ok, pk, 1, "N", 2.0, _ts(1)))
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)

    N = len(baskets)
    part_n: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:
            part_n[p] = part_n.get(p, 0) + 1
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    expect = {}
    for (a, b), n in pair_n.items():
        if n < 2:
            continue
        expect[(a, b)] = (
            n,
            part_n[a],
            part_n[b],
            n * 1_000_000 // part_n[a],
            n * N * 1_000_000 // (part_n[a] * part_n[b]),
        )
    got = {
        (r.part_a, r.part_b): (r.n_pair, r.n_a, r.n_b, r.conf_a_to_b_ppm, r.lift_ppm)
        for r in REG["orders_basket_lift"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- events_markov_transitions + events_streaks -----------------------


@pytest.mark.parametrize("seed", [51, 52])
def test_markov_and_streaks_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(1, rng.randint(3, 8)):
        for _ in range(rng.randint(2, 25)):
            eid += 1
            rows.append(
                (eid, uid, _ts(rng.randint(1, 20), rng.randint(0, 23), eid % 60),
                 1.0, rng.choice("abc"))
            )
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)

    # markov mirror: per user ordered by (ts, event_id)
    trans: dict[tuple[str, str], int] = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[1], []).append(r)
    for evs in by_user.values():
        evs.sort(key=lambda r: (r[2], r[0]))
        for a, b in zip(evs, evs[1:]):
            trans[(a[4], b[4])] = trans.get((a[4], b[4]), 0) + 1
    row_tot: dict[str, int] = {}
    for (p, _), n in trans.items():
        row_tot[p] = row_tot.get(p, 0) + n
    expect_m = {
        k: (n, n * 1_000_000 // row_tot[k[0]]) for k, n in trans.items()
    }
    got_m = {
        (r.prev_type, r.next_type): (r.n, r.p_ppm)
        for r in REG["events_markov_transitions"].fn(spark, str(tmp_path)).collect()
    }
    assert got_m == expect_m

    # streaks mirror
    hist: dict[int, int] = {}
    for uid, evs in by_user.items():
        days = sorted({_dnum(r[2]) for r in evs})
        longest = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            longest = max(longest, cur)
        hist[longest] = hist.get(longest, 0) + 1
    got_s = {
        r.streak_len: r.n_users
        for r in REG["events_streaks"].fn(spark, str(tmp_path)).collect()
    }
    assert got_s == hist


# ---- supplier_return_rate ---------------------------------------------


@pytest.mark.parametrize("seed", [61])
def test_supplier_wilson_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    sups = {}
    for sk in range(1, rng.randint(4, 10)):
        n = rng.randint(1, 60)
        r_cnt = rng.randint(0, n)
        sups[sk] = (n, r_cnt)
        for i in range(n):
            rows.append((1000 + len(rows), 1, sk, "R" if i < r_cnt else "N", 1.0, _ts(1)))
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(spark, tmp_path, "supplier",
           [(sk, f"s{sk}", 0, 0.0) for sk in sups], SUP_SCHEMA)

    z = 1.959964
    expect = {}
    for sk, (n, rc) in sups.items():
        p = rc / n
        w = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (
            1 + z * z / n
        )
        expect[sk] = (n, rc, rc * 1_000_000 // n, math.floor(w * 1e6 + 0.5))
    got = {
        r.s_suppkey: (r.n_items, r.n_returned, r.rate_ppm, r.wilson_lcb_ppm)
        for r in REG["supplier_return_rate"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- pack_bins_nextfit_portable ----------------------------------------


@pytest.mark.parametrize("seed", [71, 72])
def test_nextfit_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    docs: dict[str, list[tuple[int, int]]] = {}
    did = 0
    for src in ("s1", "s2"):
        for _ in range(rng.randint(3, 60)):
            did += 1
            n_tok = rng.randint(1, 700)
            rows.append((did, " ".join(["w"] * n_tok), "en", src, n_tok))
            docs.setdefault(src, []).append((did, n_tok))
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    expect = {}
    for src, items in docs.items():
        items.sort(key=lambda x: (-x[1], x[0]))
        fill, bin_id = 0, 0
        for rn, (did_, n_tok) in enumerate(items[:50], 1):
            if bin_id == 0 or fill + n_tok > 512:
                bin_id += 1
                fill = n_tok
            else:
                fill += n_tok
            expect[(src, did_)] = (n_tok, rn, bin_id)
    got = {
        (r.source, r.doc_id): (r.n_tokens, r.rn, r.bin)
        for r in REG["pack_bins_nextfit_portable"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- multimodal_phash_portable -----------------------------------------


@pytest.mark.parametrize("seed", [81, 82])
def test_phash_portable_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    texts = []
    # a few shared-prefix families + unrelated docs
    for fam in range(rng.randint(1, 4)):
        prefix = "".join(rng.choice("abcdef ") for _ in range(70))
        for _ in range(rng.randint(1, 3)):
            texts.append(prefix + "".join(rng.choice("xyz ") for _ in range(30)))
    for _ in range(rng.randint(2, 6)):
        texts.append("".join(rng.choice("ghijkl mnop") for _ in range(90)))
    rows = [(i + 1, t, "en", "s1", len(t)) for i, t in enumerate(texts)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    def fp(t):
        return int(hashlib.md5(t[:64].encode()).hexdigest()[:15], 16)

    fps = {i + 1: fp(t) for i, t in enumerate(texts)}
    expect = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            fa, fb = fps[a], fps[b]
            bands_collide = any(
                (fa >> (15 * c)) & 0x7FFF == (fb >> (15 * c)) & 0x7FFF
                for c in range(4)
            )
            ham = bin(fa ^ fb).count("1")
            if bands_collide and ham <= 12:
                expect.add((a, b, ham))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in REG["multimodal_phash_portable"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- text_bytes_portable -----------------------------------------------


@pytest.mark.parametrize("seed", [91])
def test_text_bytes_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    alphabet = "ab é漢👩 \t"
    rows = []
    for i in range(rng.randint(10, 40)):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
        rows.append((i + 1, t, "en", "s1", len(t)))
    rows.append((999, None, "en", "s1", 0))
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    expect = {}
    for did, t, *_ in rows:
        t = t or ""
        rb, nc = len(t.encode("utf-8")), len(t)
        bpc = math.floor(rb / nc * 10000 + 0.5) / 10000.0 if nc else 0.0
        expect[did] = (rb, nc, bpc)
    got = {
        r.doc_id: (r.raw_bytes, r.n_chars, r.bytes_per_char)
        for r in REG["text_bytes_portable"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- embed_silhouette_simplified ----------------------------------------


@pytest.mark.parametrize("seed", [95, 96])
def test_silhouette_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    labels = list(range(rng.randint(2, 4)))
    rows, vid = [], 0
    for lab in labels:
        center = [rng.uniform(-2, 2) for _ in range(64)]
        for _ in range(rng.randint(2, 8)):
            vid += 1
            rows.append(
                (vid, [c + rng.uniform(-0.3, 0.3) for c in center], lab)
            )
    # float32 storage: mirror through float32 like the parquet column
    import numpy as np

    rows = [(i, np.asarray(v, dtype=np.float32).tolist(), l) for i, v, l in rows]
    _write(spark, tmp_path, "embeddings", rows, "vec_id long, embedding array<float>, label int")

    # mirror: 1e-6 grid integers, exact integer distances
    x6 = {i: [math.floor(x * 1e6 + 0.5) for x in v] for i, v, _ in rows}
    lab_of = {i: l for i, _, l in rows}
    cents = {}
    for lab in labels:
        members = [i for i in x6 if lab_of[i] == lab]
        s6 = [sum(x6[i][d] for i in members) for d in range(64)]
        cents[lab] = (s6, len(members))
    s4_by_label: dict[int, list[int]] = {lab: [] for lab in labels}
    for i, v6 in x6.items():
        dists = {}
        for lab, (s6, n) in cents.items():
            d2 = sum((v6[d] * n - s6[d]) ** 2 for d in range(64))
            dists[lab] = math.sqrt(float(d2)) / (n * 1e6)
        a = dists[lab_of[i]]
        b = min(d for lab, d in dists.items() if lab != lab_of[i])
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        s4_by_label[lab_of[i]].append(math.floor(s * 10000 + 0.5))
    expect = {
        lab: (len(v), math.floor(sum(v) * 100.0 / len(v)))
        for lab, v in s4_by_label.items()
    }
    got = {
        r.label: (r.n_members, r.silhouette_ppm)
        for r in REG["embed_silhouette_simplified"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
