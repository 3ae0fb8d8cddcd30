"""Pure scorer kernels (no Spark dependency).

Scalar semantic ground truth in :mod:`fuzzspark.kernels.metrics` and
:mod:`fuzzspark.kernels.fuzz`; Arrow-batch engine in
:mod:`fuzzspark.kernels.batch`.
"""

from .metrics import (  # noqa: F401
    ALL_METRICS,
    HammingError,
    damerau_levenshtein,
    hamming,
    indel,
    jaro,
    jaro_winkler,
    lcs_seq,
    levenshtein,
    osa,
    postfix,
    prefix,
)
from .fuzz import partial_ratio, ratio, token_set_ratio, token_sort_ratio  # noqa: F401
from .batch import FORMS, SCORERS, batch_scores  # noqa: F401
