from myraytracer_tpu.output.image import (
    gamma_encode,
    to_u8,
    write_image,
    write_png,
    write_ppm,
)

__all__ = ["gamma_encode", "to_u8", "write_image", "write_png", "write_ppm"]
