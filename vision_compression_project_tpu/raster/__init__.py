from .rasterizer import PdfDocument, RasterError
from .pdfgen import make_pdf

__all__ = ["PdfDocument", "RasterError", "make_pdf"]
