from . import inits  # noqa: F401
from .conv import MessagePassing, SAGEConv  # noqa: F401
from .hetero_conv import HeteroConv  # noqa: F401
from . import dense  # noqa: F401
from . import conv  # noqa: F401
