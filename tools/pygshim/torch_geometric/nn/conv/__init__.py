from .message_passing import MessagePassing
from .sage_conv import SAGEConv

__all__ = ["MessagePassing", "SAGEConv"]
