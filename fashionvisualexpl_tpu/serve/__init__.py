from fashionvisualexpl_tpu.serve.engine import RecServer, quantize_rows

__all__ = ["RecServer", "quantize_rows"]
