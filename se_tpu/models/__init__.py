"""The model zoo. Import a family's module or use the registry:

    from se_tpu.models import get_model
    model, preset = get_model("gcrn")
"""

from se_tpu.models.registry import get_model, register, available_models  # noqa: F401

# Import model modules for their registration side effects.
from se_tpu.models import lstm as _lstm  # noqa: F401
from se_tpu.models import crn as _crn  # noqa: F401
from se_tpu.models import gcrn as _gcrn  # noqa: F401
from se_tpu.models import dpcrn as _dpcrn  # noqa: F401
