from .file_pipeline import stream_csv_to_warehouse

__all__ = ["stream_csv_to_warehouse"]
