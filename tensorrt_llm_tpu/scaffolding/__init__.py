from .controllers import (BestOfNController, MajorityVoteController,  # noqa: F401
                          ScaffoldingLlm)
