from .openai_server import OpenAIServer  # noqa: F401
