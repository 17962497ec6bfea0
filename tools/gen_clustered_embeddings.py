"""Generate fixtures/embeddings_clustered.parquet — a mixture-of-Gaussians
embedding corpus (VERDICT r8 #4).

Every committed ANN operating point (PQ recall 57-80%, the nprobe knee at
6 ≈ 60% of corpus) is measured on the near-RANDOM testdata embeddings —
honest worst-case numbers, but unrepresentative of production embeddings,
which cluster. This fixture is the representative case: 10 Gaussian
clusters in the same shape as the testdata table (2000 rows, dim 64,
float32, `label` = generating cluster — the IVF cell column, exactly how
a deployment's k-means cells align with real cluster structure).

Deterministic (fixed seed), committed once like fixtures/wide92.parquet;
regenerate only if the shape changes. Tools consume it via
`--emb fixtures/embeddings_clustered.parquet` (tools/nprobe_curve.py,
tools/pq_train_sweep.py); the registered contracts stay on the testdata
corpus — this file is measurement evidence, not contract input.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_VECS = 2000
DIM = 64
K = 10
#: Within-cluster spread vs unit-norm centers. Picked by measured sweep
#: (SCALING.md r9): at 0.18 IVF is trivially perfect (recall 1.000 at
#: nprobe=1 — a flat curve carries no information); at 0.3 the clusters
#: overlap enough that the knee is visible (nprobe 1→2→3 = 0.633→0.800→
#: 0.900, plateau after) while remaining far from the random corpus's
#: knee at 6. 0.3 is the committed, most informative operating regime.
SIGMA = 0.3
SEED = 20260815

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "embeddings_clustered.parquet",
)


def main() -> None:
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(K, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, K, size=N_VECS)
    vecs = centers[labels] + rng.normal(scale=SIGMA, size=(N_VECS, DIM))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {OUT}: {N_VECS} vectors, dim {DIM}, {K} clusters")


if __name__ == "__main__":
    main()
