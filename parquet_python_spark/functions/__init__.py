from . import (dedup, multimodal, profile, sampling,  # noqa: F401
               similarity, text)
