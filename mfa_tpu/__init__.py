"""Short import alias for :mod:`montreal_forced_aligner_tpu`."""
import sys as _sys

from montreal_forced_aligner_tpu import *  # noqa: F401,F403
from montreal_forced_aligner_tpu import __version__  # noqa: F401

_sys.modules.setdefault("mfa_tpu._base", _sys.modules["montreal_forced_aligner_tpu"])
