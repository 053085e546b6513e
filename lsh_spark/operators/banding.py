"""Banding parameter selection for MinHash LSH.

The collision probability of one (band_count=b, band_size=r) banding for a
pair with Jaccard j is  P(j) = 1 - (1 - j^r)^b  — the standard S-curve.
``tune_bands`` picks (b, r) to meet a recall target at the verification
threshold while maximizing selectivity against a background similarity
level, under a signature-size budget.  This is the knob that decides
whether the blocking join passes 5% or 85% of all pairs (measured on the
test corpus: background j≈0.45 median makes r=2 useless and r=6 sharp).
"""

from __future__ import annotations

from dataclasses import dataclass


def collision_probability(j: float, band_count: int, band_size: int) -> float:
    """P(≥1 band collides) for a pair with Jaccard ``j``."""
    return 1.0 - (1.0 - j**band_size) ** band_count


@dataclass(frozen=True)
class BandingPlan:
    band_count: int
    band_size: int
    recall_at_threshold: float
    background_pass_rate: float

    @property
    def signature_size(self) -> int:
        return self.band_count * self.band_size


def tune_bands(
    threshold: float,
    *,
    target_recall: float = 0.95,
    background_similarity: float = 0.2,
    max_signature_size: int = 256,
) -> BandingPlan:
    """Smallest-signature (b, r) meeting ``target_recall`` at
    ``threshold``; among those, the most selective against
    ``background_similarity`` (estimate it with a pair sample — e.g. the
    median of ``lsh_jaccard`` over random pairs) wins.

    Raises if no plan within the signature budget reaches the recall.
    """
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    best: BandingPlan | None = None
    for r in range(1, 33):
        for b in range(1, max_signature_size // r + 1):
            recall = collision_probability(threshold, b, r)
            if recall < target_recall:
                continue
            plan = BandingPlan(
                band_count=b,
                band_size=r,
                recall_at_threshold=recall,
                background_pass_rate=collision_probability(
                    background_similarity, b, r),
            )
            if (
                best is None
                or plan.background_pass_rate < best.background_pass_rate
                or (
                    plan.background_pass_rate == best.background_pass_rate
                    and plan.signature_size < best.signature_size
                )
            ):
                best = plan
            break  # larger b for same r only costs more; move to next r
    if best is None:
        raise ValueError(
            f"no (band_count, band_size) within signature budget "
            f"{max_signature_size} reaches recall {target_recall} at "
            f"threshold {threshold}")
    return best


def euclidean_collision_probability(distance: float, bucket_width: float) -> float:
    """Per-projection collision probability of p-stable Euclidean LSH for
    two points at ``distance`` (Datar et al. 2004): the probability two
    points land in the same width-``bucket_width`` bucket of a random
    Gaussian projection."""
    from math import erf, exp, pi, sqrt

    if distance <= 0:
        return 1.0
    c = bucket_width / distance
    phi_neg = 0.5 * (1.0 + erf(-c / sqrt(2.0)))
    return (1.0 - 2.0 * phi_neg
            - (2.0 / (sqrt(2.0 * pi) * c)) * (1.0 - exp(-c * c / 2.0)))


def euclidean_banding_pass_rate(
    distance: float, bucket_width: float, band_count: int, band_size: int,
) -> float:
    """P(≥1 band collides) for a pair at ``distance`` under
    (band_count, band_size) Euclidean-LSH banding — the S-curve of the
    Euclidean family, used to predict whether banding actually blocks.

    For unit-norm embeddings an unrelated pair sits near distance √2
    (cosine ≈ 0), so ``euclidean_banding_pass_rate(sqrt(2), w, b, r)``
    estimates the background pass rate: if it is high, the blocking join
    degenerates into the full cross product and a verify-first plan wins
    (see ``dedup.embedding_near_dup_lsh``)."""
    p = euclidean_collision_probability(distance, bucket_width)
    return collision_probability(p, band_count, band_size)
