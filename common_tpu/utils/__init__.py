from common_tpu.utils.util import (  # noqa: F401
    almost_eq,
    logsumexp,
    random_assignment_vector,
    random_orthonormal_matrix,
)
from common_tpu.utils import debug  # noqa: F401
from common_tpu.utils import fastrand  # noqa: F401
from common_tpu.utils import linalg  # noqa: F401
