from .ordering import ROW_ORD, ensure_row_ord, dense_index, strip_internal
