from genometester4_tpu.formats.list_format import (  # noqa: F401
    ListHeader,
    read_list,
    read_list_header,
    write_list,
    ListWriter,
)
