from . import hashing, images, text, urlnorm  # noqa: F401
