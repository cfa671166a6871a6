"""KiwiSDR-protocol server layer (WebSocket streams + REST)."""

from .kiwi_server import KiwiServer
from . import packets
