from .service import serve  # noqa
