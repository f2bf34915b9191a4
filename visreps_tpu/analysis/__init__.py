from visreps_tpu.analysis.alignment import (
    AlignmentData,
    align_stimulus_level,
    prepare_traintest_alignment,
    prepare_concept_alignment,
    compute_traintest_alignment,
)
from visreps_tpu.analysis.rsa import compute_rsa, concept_average_exact
from visreps_tpu.analysis.encoding import compute_encoding_score

__all__ = [
    "AlignmentData",
    "align_stimulus_level",
    "prepare_traintest_alignment",
    "prepare_concept_alignment",
    "compute_traintest_alignment",
    "compute_rsa",
    "concept_average_exact",
    "compute_encoding_score",
]
