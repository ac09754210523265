"""Extension-operator registry facade (SURVEY §7.7).

Round 8 split the 3.8k-line monolith by family (VERDICT r7 #7) with entry
names, oracles, and behavior unchanged:

- ``registry_ext_base``   — shared SQL fragments + planted-dup fixtures
- ``registry_ext_text``   — text analysis (counts, quality, lang-id, PMI…)
- ``registry_ext_dedup``  — dedup + decontamination (MinHash/SimHash/Bloom…)
- ``registry_ext_sketch`` — KMV/quantile sketches + DataSketches siblings
- ``registry_ext_ann``    — ANN search, kNN graphs, quantization
- ``registry_ext_pipe``   — corpus assembly (splits/packing/mixing) + multimodal
- ``registry_ext_rel``    — relational/profiling/data-quality entries
- ``registry_ext_suffix`` — distributed suffix array / LCP / exact LRS
- ``registry_ext_codec``  — Rice/fixed-predictor lossless audio codec

Importing this module registers every family's entries (the same
side-effect contract ``ibc_spark.registry`` has always relied on), and the
legacy private names other modules/tests import from here are re-exported
unchanged.

Shares the cross-engine determinism rules of ``ibc_spark.registry`` —
notably: every similarity is a LEFT FOLD in doubles on both engines, so
values match bit-for-bit before the defensive ROUND.
"""

from __future__ import annotations

# Shared fragments first (leaf), then the family modules for their
# registration side effects — import order sets only the last-resort
# position tiebreaker in the driver's attestation rotation.
from ibc_spark.registry_ext_base import (  # noqa: F401
    _AUG_SQL,
    _FOLD_SUM_D,
    _PLANT_SQL,
    _PLANTED_PAIRS,
    _SHINGLES,
    _TOKS,
    _augmented_embeddings,
    _cos_sql,
    _planted_embeddings,
    _planted_lsh_pairs,
)
from ibc_spark import registry_ext_text  # noqa: E402,F401
from ibc_spark import registry_ext_dedup  # noqa: E402,F401
from ibc_spark import registry_ext_sketch  # noqa: E402,F401
from ibc_spark import registry_ext_ann  # noqa: E402,F401
from ibc_spark import registry_ext_pipe  # noqa: E402,F401
from ibc_spark import registry_ext_rel  # noqa: E402,F401
from ibc_spark import registry_ext_suffix  # noqa: E402,F401
from ibc_spark import registry_ext_codec  # noqa: E402,F401

# Legacy re-exports (registry_extras + tests import these from here).
from ibc_spark.registry_ext_dedup import _BLOOM_K, _BLOOM_M  # noqa: F401
from ibc_spark.registry_ext_sketch import _KMV_K  # noqa: F401
