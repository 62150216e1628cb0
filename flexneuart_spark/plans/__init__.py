from flexneuart_spark.plans.entries import flagship  # noqa: F401
from flexneuart_spark.plans import entries as _core
from flexneuart_spark.plans import entries_ext as _ext
from flexneuart_spark.plans import entries_ops as _ops
from flexneuart_spark.plans import entries_prox as _prox
from flexneuart_spark.plans import entries_stem as _stem
from flexneuart_spark.plans import entries_bert as _bert
from flexneuart_spark.plans import entries_lmart as _lmart
from flexneuart_spark.plans import entries_lemma as _lemma
from flexneuart_spark.plans import entries_model1 as _m1
from flexneuart_spark.plans import entries_neural as _neural
from flexneuart_spark.plans import entries_rm3 as _rm3

QUERIES_REG = {
    **_core.QUERIES_REG,
    **_ops.OPS_QUERIES_REG,
    **_prox.PROX_QUERIES_REG,
    **_ext.EXT_QUERIES_REG,
    **_stem.STEM_QUERIES_REG,
    **_bert.BERT_QUERIES_REG,
    **_lmart.LMART_QUERIES_REG,
    **_lemma.LEMMA_QUERIES_REG,
    **_m1.MODEL1_QUERIES_REG,
    **_neural.NEURAL_QUERIES_REG,
    **_rm3.RM3_QUERIES_REG,
}
ORACLE_SQL = {
    **_core.ORACLE_SQL,
    **_ops.OPS_ORACLE_SQL,
    **_prox.PROX_ORACLE_SQL,
    **_ext.EXT_ORACLE_SQL,
    **_stem.STEM_ORACLE_SQL,
    **_bert.BERT_ORACLE_SQL,
    **_lmart.LMART_ORACLE_SQL,
    **_lemma.LEMMA_ORACLE_SQL,
    **_m1.MODEL1_ORACLE_SQL,
    **_neural.NEURAL_ORACLE_SQL,
    **_rm3.RM3_ORACLE_SQL,
}

