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
from se_tpu.models import fullsubnet as _fullsubnet  # noqa: F401
from se_tpu.models import dccrn as _dccrn  # noqa: F401
from se_tpu.models import ctsnet as _ctsnet  # noqa: F401
from se_tpu.models import g2net as _g2net  # noqa: F401
from se_tpu.models import taylorsenet as _taylorsenet  # noqa: F401
from se_tpu.models import uformer as _uformer  # noqa: F401
from se_tpu.models import deepxi as _deepxi  # noqa: F401
