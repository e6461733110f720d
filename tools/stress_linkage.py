#!/usr/bin/env python
"""Hot-block stress for the capped fuzzy-linkage path (r6 verdict #4/#5).

Generates N entity names with an adversarial blocking-key distribution —
half of them share ONE last token ("inc"), the hot non-discriminative
suffix real entity data has — plants ~15% near-duplicate variants
(1-2 char edits of earlier names), then times:

  1. fuzzy_block_pairs with block_cap (the O(N*cap) production path)
  2. resolve_entities end-to-end (pairs -> CC -> canonicalize)

at two scales for the exponent, plus recall of the capped pair list
against planted-variant ground truth. Prints one JSON line per
measurement. Usage:

  python tools/stress_linkage.py [--scales 50000,100000] [--cap 200]
       [--extra-seeds 1,2]   # seeded head_min_bigram domain keys
                             # appended via extra_blocks= ('' to skip)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORDS = (
    "global alpha nova prime delta united metro apex core vertex summit "
    "pacific atlantic northern southern digital quantum stellar omega "
    "fusion matrix cobalt argent velvet copper".split()
)
SUFFIXES = ["inc"] * 10 + ["llc", "gmbh", "ltd", "corp", "sa", "plc", "co", "ag", "oy", "ab"]


def gen_names(n: int, rng: np.random.Generator):
    """(names, planted) — planted is a set of (a, b) true variant pairs
    (1 char substituted, so levenshtein == 1 and same last token)."""
    base = []
    for i in range(n):
        k = rng.integers(1, 4)
        words = " ".join(rng.choice(WORDS, size=k))
        suf = SUFFIXES[int(rng.integers(0, len(SUFFIXES)))]
        base.append(f"{words} {i:06d} {suf}")
    planted = set()
    n_var = n * 15 // 100
    srcs = rng.integers(0, n, size=n_var)
    names = list(base)
    for j, s in enumerate(srcs):
        src = base[s]
        pos = int(rng.integers(0, max(1, len(src) - len(src.split()[-1]) - 2)))
        ch = chr(ord("a") + int(rng.integers(0, 26)))
        if src[pos] in (" ",):
            pos += 1
        var = src[:pos] + ch + src[pos + 1:]
        if var != src:
            names.append(var)
            planted.add(tuple(sorted((src, var))))
    return names, planted


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="50000,100000")
    ap.add_argument("--cap", type=int, default=200)
    ap.add_argument("--extra-seeds", default="1,2")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    extra_seeds = [int(s) for s in args.extra_seeds.split(",") if s]

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.linkage import (
        fuzzy_block_pairs,
        fuzzy_block_pairs_multi,
        resolve_entities,
    )

    spark = get_spark(app_name="stress-linkage")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    walls = {}
    for n in scales:
        rng = np.random.default_rng(7)
        names_list, planted = gen_names(n, rng)
        names = spark.createDataFrame(
            [(x,) for x in names_list], ["name"]
        ).repartition(32).cache()
        names.count()

        t0 = time.perf_counter()
        pairs = fuzzy_block_pairs(
            names, max_dist=4, block_cap=args.cap
        ).cache()
        n_pairs = pairs.count()
        w_pairs = time.perf_counter() - t0

        got = {
            tuple(sorted((r.name_a, r.name_b))) for r in pairs.collect()
        }
        recall = len(got & planted) / max(1, len(planted))

        t0 = time.perf_counter()
        multi = fuzzy_block_pairs_multi(
            names, max_dist=4, block_cap=args.cap
        )
        got_multi = {
            tuple(sorted((r.name_a, r.name_b))) for r in multi.collect()
        }
        w_multi = time.perf_counter() - t0
        recall_multi = len(got_multi & planted) / max(1, len(planted))

        w_extra = recall_extra = None
        if extra_seeds:
            from ubeardw_databricks_lakehouse_spark.operators.linkage import (
                head_min_bigram,
            )

            t0 = time.perf_counter()
            extra = fuzzy_block_pairs_multi(
                names,
                max_dist=4,
                block_cap=args.cap,
                extra_blocks=[
                    head_min_bigram("name", seed=s) for s in extra_seeds
                ],
            )
            got_extra = {
                tuple(sorted((r.name_a, r.name_b)))
                for r in extra.collect()
            }
            w_extra = time.perf_counter() - t0
            recall_extra = len(got_extra & planted) / max(1, len(planted))
            assert got_multi <= got_extra, (
                "extra_blocks must be a superset of the default battery"
            )

        # the structured-ID domain keys (the hook's headline use): the
        # generator's names carry a serial as the head's last token,
        # exactly the corpus shape id_half_keys targets
        from ubeardw_databricks_lakehouse_spark.operators.linkage import (
            id_half_keys,
        )

        t0 = time.perf_counter()
        dom = fuzzy_block_pairs_multi(
            names,
            max_dist=4,
            block_cap=args.cap,
            extra_blocks=id_half_keys("name"),
        )
        got_dom = {
            tuple(sorted((r.name_a, r.name_b))) for r in dom.collect()
        }
        w_dom = time.perf_counter() - t0
        recall_dom = len(got_dom & planted) / max(1, len(planted))
        assert got_multi <= got_dom

        t0 = time.perf_counter()
        ents = resolve_entities(names, block_cap=args.cap)
        n_clusters = ents.filter("is_canonical").count()
        w_er = time.perf_counter() - t0

        walls[n] = (w_pairs, w_er)
        print(json.dumps({
            "scale": n, "cap": args.cap,
            "total_names": len(names_list),
            "pairs_wall_s": round(w_pairs, 2),
            "n_pairs": n_pairs,
            "planted": len(planted),
            "capped_recall": round(recall, 4),
            "multi_pass_wall_s": round(w_multi, 2),
            "multi_pass_recall": round(recall_multi, 4),
            "extra_seeds": extra_seeds or None,
            "extra_wall_s": round(w_extra, 2) if w_extra else None,
            "extra_recall": round(recall_extra, 4)
            if recall_extra is not None
            else None,
            "domain_halfkey_wall_s": round(w_dom, 2),
            "domain_halfkey_recall": round(recall_dom, 4),
            "er_wall_s": round(w_er, 2),
            "n_clusters": n_clusters,
        }))
        pairs.unpersist()
        names.unpersist()

    if len(scales) == 2:
        n1, n2 = scales
        for idx, leg in ((0, "pairs"), (1, "er")):
            e = (
                np.log(walls[n2][idx] / walls[n1][idx])
                / np.log(n2 / n1)
            )
            print(json.dumps({"leg": leg, "exponent": round(float(e), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
