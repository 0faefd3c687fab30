"""Host utilities: logging, image IO, path resolution, checkpointing."""

from .log import Logger, log
from .image import write_png, read_png, load_cubemap_cross
from .paths import resolve_path, resolve_dir
