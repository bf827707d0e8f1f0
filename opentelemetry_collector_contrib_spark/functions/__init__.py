from .severity import SEVERITY_TEXT_TO_NUMBER, severity_number_col, severity_text_col  # noqa: F401
from .timefmt import strptime_to_spark  # noqa: F401
