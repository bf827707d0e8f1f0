from .tokens import (  # noqa: F401
    TOKENS_SCHEMA,
    decode_tokens,
    encode_lines_to_tokens_table,
    generate_tokens_table,
    write_tokens_parquet,
    read_tokens,
    dim_source_rows,
    dim_namespace_rows,
)
