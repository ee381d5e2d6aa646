"""SemDeDup cell-bound evidence → BENCH/SEMDEDUP.md.

Demonstrates, with measured numbers, that semantic_dedup's derived
``nlist`` (target ~10^3 docs/cell) plus the ``max_cell_size`` exclusion
bound the within-cell candidate-pair count — the quantity that decides
whether the operator survives a 100x scale-up — against the fixed
nlist=8 default r4 shipped (whose pair join is all-pairs with a constant
shaved off).

Synthetic corpus: deterministic 64-dim embeddings with latent cluster
structure plus a deliberately skewed blob (near-constant pages / SEO spam
analog) that lands one cell over the cap, so the exclusion path is
exercised with real mass, not an empty set.

Run: PYTHONPATH=/root/repo python scripts/semdedup_evidence.py
"""

from __future__ import annotations

import math
import time

import numpy as np

from wordscape_spark.operators import similarity as S

N = 100_000
DIM = 64
N_LATENT = 200
SKEW_FRAC = 0.08  # one near-constant direction holding 8% of the corpus
E2E_N = 20_000  # end-to-end semantic_dedup run size


def make_embeddings(n: int, rng: np.random.Generator) -> np.ndarray:
    latents = rng.normal(size=(N_LATENT, DIM))
    latents /= np.linalg.norm(latents, axis=1, keepdims=True)
    which = rng.integers(0, N_LATENT, size=n)
    base = latents[which] + 0.35 * rng.normal(size=(n, DIM))
    n_skew = int(n * SKEW_FRAC)
    skew_dir = latents[0]
    base[:n_skew] = skew_dir + 0.02 * rng.normal(size=(n_skew, DIM))
    return base.astype(np.float64)


def pair_count(cell_sizes: list[int]) -> int:
    return sum(c * (c - 1) // 2 for c in cell_sizes)


def assign_cells(emb: np.ndarray, cents: list[list[float]]) -> np.ndarray:
    """numpy mirror of with_ivf_cell_rounded's argmax (6dp round, ties →
    lowest index) — used only to histogram cells at N=100k without paying
    the interpreted-HOF assignment for the counting half of the evidence;
    the end-to-end run below uses the real operator."""
    c = np.asarray(cents)
    scores = np.round(emb @ c.T, 6)
    return scores.argmax(axis=1)


def main() -> None:
    rng = np.random.default_rng(0x5E3D)
    emb = make_embeddings(N, rng)

    nlist = S.semantic_nlist(N)
    sample_n = max(S.IVF_SAMPLE, 32 * nlist)
    # mirror sample_for_training: md5-hash-ordered head (decorrelated from
    # id order — ids 0..N-1 here, where the first 8% are the skew blob)
    order = sorted(range(N), key=lambda i: (S.sample_order_key(i), i))
    sample = emb[order[:sample_n]].tolist()
    t0 = time.monotonic()
    cents = S.train_ivf_centroids(sample, nlist)
    train_s = time.monotonic() - t0

    cells = assign_cells(emb, cents)
    sizes = np.bincount(cells, minlength=nlist)
    max_cell = int(sizes.max())
    cap = 4 * S.SEMDEDUP_CELL_TARGET
    kept = [int(s) for s in sizes if 0 < s <= cap]
    excluded = [int(s) for s in sizes if s > cap]

    derived_pairs = pair_count(kept)
    derived_pairs_uncapped = pair_count([int(s) for s in sizes if s])
    # fixed nlist=8 baseline (r4 default): same corpus, 8 centroids
    cents8 = S.train_ivf_centroids(sample, 8)
    sizes8 = np.bincount(assign_cells(emb, cents8), minlength=8)
    fixed_pairs = pair_count([int(s) for s in sizes8])
    all_pairs = N * (N - 1) // 2

    # id-ordered-head counterfactual (pre-r5 sampling): ids arrive
    # clustered, so the head is 100% skew blob -> degenerate centroids
    cents_head = S.train_ivf_centroids(emb[:sample_n].tolist(), nlist)
    sizes_head = np.bincount(assign_cells(emb, cents_head), minlength=nlist)
    head_excluded = [int(s) for s in sizes_head if s > cap]

    # end-to-end at E2E_N through the real operator (derived nlist)
    from wordscape_spark.session import build_session

    spark = build_session(app_name="semdedup-evidence", master="local[8]",
                          shuffle_partitions=8)
    emb_small = make_embeddings(E2E_N, np.random.default_rng(0x5E3E))
    df = spark.createDataFrame(
        [(str(i), emb_small[i].tolist()) for i in range(E2E_N)],
        "vec_id string, embedding array<double>",
    ).repartition(8).cache()
    df.count()
    t0 = time.monotonic()
    out = S.semantic_dedup(df, threshold=0.35)
    n_out = out.count()
    e2e_s = time.monotonic() - t0
    e2e_nlist = S.semantic_nlist(E2E_N)
    spark.stop()

    lines = [
        "# SemDeDup cell-size bound (round 5)",
        "",
        "`semantic_dedup` pairs only WITHIN IVF cells; the candidate-pair",
        "count Σ n_c·(n_c−1)/2 is what scales.  r4 shipped a fixed nlist=8",
        "(cells O(N/8) → all-pairs with a constant shaved off); r5 derives",
        "nlist from corpus cardinality (`semantic_nlist`, target "
        f"~{S.SEMDEDUP_CELL_TARGET} docs/cell)",
        f"and EXCLUDES cells over max_cell_size={cap} from pairing",
        "(lower-bound semantics — the `max_shingle_df` escape hatch).",
        "",
        f"Corpus: N={N:,} synthetic 64-dim embeddings, {N_LATENT} latent",
        f"clusters + a skewed blob holding {SKEW_FRAC:.0%} of the corpus",
        "(near-constant-page analog) so the cap path carries real mass.",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| all-pairs N(N−1)/2 | {all_pairs:,} |",
        f"| fixed nlist=8 within-cell pairs (r4 default) | {fixed_pairs:,} |",
        f"| derived nlist={nlist} pairs, no cap | {derived_pairs_uncapped:,} |",
        f"| derived nlist={nlist} pairs, capped | {derived_pairs:,} |",
        f"| largest cell | {max_cell:,} (cap {cap:,}) |",
        f"| cells excluded by cap | {len(excluded)} ({sum(excluded):,} docs"
        " kept, never paired) |",
        f"| …with pre-r5 id-ordered-head sampling | {len(head_excluded)}"
        f" cells over cap ({sum(head_excluded):,} docs) — the head is all"
        " skew blob, centroids degenerate (why sampling is md5-hash-ordered"
        " now) |",
        f"| driver-side training ({sample_n}-vector sample, pure python) |"
        f" {train_s:.1f}s |",
        "",
        f"Reduction vs fixed nlist=8: **{fixed_pairs / max(derived_pairs, 1):,.0f}×**"
        f" fewer candidate pairs; vs all-pairs: {all_pairs / max(derived_pairs, 1):,.0f}×.",
        "The capped pair count is bounded by nlist · C(cap, 2) regardless of",
        "skew, so one hot cell can never re-create the quadratic join.",
        "",
        f"End-to-end `semantic_dedup` at N={E2E_N:,} (derived nlist="
        f"{e2e_nlist}, real",
        f"operator incl. clustering): {n_out:,} duplicate rows in"
        f" {e2e_s:.1f}s on local[8].",
        "",
        "At 10^8+ docs `semantic_nlist` caps at "
        f"{S.SEMDEDUP_NLIST_CAP:,} (driver trainer bound);",
        "past that the per-cell cap alone bounds work, and a real",
        "deployment trains centroids with FAISS/GPU and shards",
        "hierarchically (operators/similarity.py:semantic_nlist docstring).",
        "",
    ]
    with open("BENCH/SEMDEDUP.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
