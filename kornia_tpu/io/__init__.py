from .io import ImageLoadType, load_image, write_image
