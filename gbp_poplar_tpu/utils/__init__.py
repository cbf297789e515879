"""Host-side utilities: data IO, priors, flags, evaluation, checkpointing."""

from . import analysis, balio, checkpoint, debug, evaluation, flags, priors  # noqa: F401
