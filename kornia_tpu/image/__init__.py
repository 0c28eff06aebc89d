from .image import ChannelsOrder, ColorSpace, Image, ImageLayout, ImageSize, PixelFormat
from .draw import draw_convex_polygon, draw_line, draw_point2d, draw_rectangle
