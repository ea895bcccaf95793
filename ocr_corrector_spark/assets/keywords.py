"""Keyword dictionary (credit-report vocabulary).

Data parity with the reference dictionary file
``/root/reference/corrector/config/kwds_credit_report.txt`` (loaded at
keyword_corrector.py:115-121 into a set and at BKtree.py:74-84 into the
BK-tree).  Order below is the FILE order — this engine's canonical BK-tree
insertion order (see functions/bktree.py docstring; the reference's own
order is nondeterministic because it iterates a set).

``逾期天`` is appended at the end: it is required by the reference's
executable BK-tree goldens (BKtree.py:50-57 — ``search('数期大',2) ->
[逾期天]``) and by the keyword-corrector doctest
(keyword_corrector.py:44-48), but is missing from the shipped config
dictionary (the doctests reference an unshipped ``data/`` variant of the
file).  Without it those published goldens cannot hold.
"""

KEYWORDS: tuple[str, ...] = (
    "账户", "管理机构", "账户标识", "开立日期", "到期日期", "借款金额",
    "账户币种", "人民币元", "业务种类", "其他个人消费贷款", "个人经营性贷款",
    "个人汽车消费贷款", "担保方式", "信用/免担保", "组合(不含保证)",
    "还款期数", "还款频率", "月", "不定期", "还款方式", "共同借款标志",
    "无", "截至年月日", "账户状态", "正常", "结清", "五级分类", "余额",
    "剩余还款期数", "本月应还款", "应还款日", "本月实还款", "最近一次",
    "还款日期", "当前逾期期数", "当前逾期总额", "逾期31-60天",
    "逾期61-90天", "逾期91-180天", "逾期180天以上", "未还本金", "已还本金",
    "年月年月的还款记录", "账户关闭日期", "特殊交易类型", "发生日期",
    "变更月数", "发生金额", "明细记录", "提前还款(全部)", "提前结清",
    "提前还款", "提前部分还款。", "发卡机构", "账户授信额度", "共享授信额度",
    "币种", "美元", "欧元", "贷记卡", "已用额度", "未出单的大额",
    "专项分期月", "剩余分期月", "最近6个月", "平均使用额度", "最大使用额度",
    "账单日", "最近一次还款日期", "销户", "销户日期", "贷款审批", "贷后管理",
    "担保资格审查", "信用卡审批", "保后管理", "保前审查", "本人",
    "本人查询(临柜)", "账户类型", "账户数", "月份数", "单月最高逾期/透支总额",
    "最长逾期/透支月数", "非循环贷账户", "贷记卡账户", "准贷记卡账户",
    "管理机构数", "授信总额", "最近6个月平均应还款", "发卡机构数",
    "逾期天",
)
