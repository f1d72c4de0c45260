from fuxictr_tpu.ops.common import (get_activation, get_initializer,
                                    get_regularizer, Activation, Dice,
                                    xavier_normal, zeros_init)
from fuxictr_tpu.ops.pooling import (MaskedAveragePooling, MaskedSumPooling,
                                     KMaxPooling, masked_average_pool,
                                     masked_sum_pool)
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.embedding import FeatureEmbedding, EmbeddingLayout
from fuxictr_tpu.ops.blocks import LogisticRegression, FactorizationMachine
from fuxictr_tpu.ops.interactions import (InnerProductInteraction, CrossNet,
                                          CrossNetV2, CrossNetMix,
                                          CompressedInteractionNet,
                                          BilinearInteraction,
                                          BilinearInteractionV2,
                                          HolographicInteraction,
                                          InteractionMachine,
                                          SqueezeExcitation)
from fuxictr_tpu.ops.attention import (ScaledDotProductAttention,
                                       MultiHeadSelfAttention,
                                       MultiHeadTargetAttention,
                                       DINAttention, DIN_Attention,
                                       TransformerEncoderLayer)
