from .paginate import paginate, to_json_page
from .upsert import merge_upsert

__all__ = ["merge_upsert", "paginate", "to_json_page"]
