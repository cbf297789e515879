"""Host-side utilities: data IO, priors, flags, evaluation, checkpointing."""

from . import balio, flags, priors  # noqa: F401
