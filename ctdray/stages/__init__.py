from .explode import explode_media_spans, explode_all_spans  # noqa: F401
from .decode import DecodeStage  # noqa: F401
from .detect import DetectExtract  # noqa: F401
from .splice import splice_groups  # noqa: F401
