from .accuracy_core import compute_threshold, hypothesis_test_pass  # noqa: F401
from .perplexity import score_token_logprobs, perplexity  # noqa: F401
