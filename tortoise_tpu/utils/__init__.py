from tortoise_tpu.utils.debug import DumpRegistry, compare_dumps  # noqa: F401
from tortoise_tpu.utils.profiling import StageTimer, trace  # noqa: F401
from tortoise_tpu.utils.progress import progress_bar  # noqa: F401
from tortoise_tpu.utils.runtime import enable_compilation_cache  # noqa: F401
