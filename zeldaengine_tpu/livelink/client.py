"""Livelink client — sendDataToEngine (ZeldaPython/ZeldaUntitled.py:12-26)."""

from __future__ import annotations

import json
import socket
from typing import Union


def send_data_to_engine(data: Union[str, dict], host: str = "127.0.0.1",
                        port: int = 8080) -> None:
    if isinstance(data, dict):
        data = json.dumps(data)
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.connect((host, port))
        s.sendall(data.encode("utf-8"))
