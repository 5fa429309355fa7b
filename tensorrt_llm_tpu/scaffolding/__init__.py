from .controllers import (BestOfNController, MajorityVoteController,  # noqa: F401
                          ScaffoldingLlm)
from .tree_search import (MCTSController, RewardWorker,  # noqa: F401
                          TOTController, TreeNode)
