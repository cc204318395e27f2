from zeldaengine_tpu.utils.image import write_png, read_png, to_uint8

__all__ = ["write_png", "read_png", "to_uint8"]
