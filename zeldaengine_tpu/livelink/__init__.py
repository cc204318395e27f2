from zeldaengine_tpu.livelink.server import LivelinkServer
from zeldaengine_tpu.livelink.client import send_data_to_engine

__all__ = ["LivelinkServer", "send_data_to_engine"]
