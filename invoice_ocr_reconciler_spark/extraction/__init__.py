from .html_extract import extract_main_text, extract_pdf_text, extract_payload
from .udfs import extract_pages

__all__ = ["extract_main_text", "extract_pdf_text", "extract_payload", "extract_pages"]
