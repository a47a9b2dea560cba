"""Host-side plotting utilities.

Figure-compatible with /root/reference/vireoSNP/plot/base_plot.py:
annotated heatmaps, genotype-distance figures written by the CLI, and
the GTbarcode mini-code plot. Matplotlib imports are deferred so the
compute path never pays for them.
"""

import numpy as np

vireo_colors = np.array(['#4796d7', '#f79e54', '#79a702', '#df5858',
                         '#556cab', '#de7a1f', '#ffda5c', '#4b595c',
                         '#6ab186', '#bddbcf', '#daad58', '#488a99',
                         '#f79b78', '#ffba00'])


def heat_matrix(X, yticks=None, xticks=None, rotation=45, cmap='BuGn',
                alpha=0.6, display_value=True, row_sort=False,
                aspect='auto', interpolation='none', **kwargs):
    """Annotated heatmap (base_plot.py:9-79)."""
    import matplotlib.pyplot as plt

    X = np.asarray(X)
    if row_sort:
        row_idx = np.argsort(np.dot(X, 2 ** np.arange(X.shape[1])))
        X = X[row_idx, :]

    im = plt.imshow(X, cmap=cmap, alpha=alpha, aspect=aspect,
                    interpolation=interpolation, **kwargs)
    if xticks is not None:
        plt.xticks(range(len(xticks)), xticks, rotation=rotation)
        plt.xlim(-0.5, len(xticks) - 0.5)
    if yticks is not None:
        plt.yticks(range(len(yticks)), yticks)
        plt.ylim(-0.5, len(yticks) - 0.5)

    if display_value:
        for i in range(X.shape[0]):
            for j in range(X.shape[1]):
                plt.text(j, i, "%.2f" % X[i, j],
                         ha="center", va="center", color="k")
    return im


def _gt_distance(A, B):
    """Mean absolute genotype-probability distance between donor slices."""
    Af = np.swapaxes(np.asarray(A), 0, 1).reshape(A.shape[1], -1)
    Bf = np.swapaxes(np.asarray(B), 0, 1).reshape(B.shape[1], -1)
    return np.abs(Af[:, None, :] - Bf[None, :, :]).mean(axis=2)


def plot_GT(out_dir, cell_GPb, donor_names, donor_GPb=None,
            donor_names_in=None):
    """Write fig_GT_distance_estimated.pdf (and _input.pdf when donor
    genotypes were provided), as the CLI does (base_plot.py:82-114)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    diff_mat = _gt_distance(cell_GPb, cell_GPb)
    fig = plt.figure()
    heat_matrix(diff_mat, donor_names, donor_names)
    plt.title("Geno Prob Delta: %d SNPs" % (cell_GPb.shape[0]))
    plt.tight_layout()
    fig.savefig(out_dir + "/fig_GT_distance_estimated.pdf", dpi=300)
    plt.close(fig)

    if donor_GPb is not None:
        diff_mat = _gt_distance(cell_GPb, donor_GPb)
        fig = plt.figure()
        heat_matrix(diff_mat, donor_names, donor_names_in)
        plt.title("Geno Prob Delta: %d SNPs" % (cell_GPb.shape[0]))
        plt.tight_layout()
        fig.savefig(out_dir + "/fig_GT_distance_input.pdf", dpi=300)
        plt.close(fig)


def minicode_plot(barcode_set, var_ids=None, sample_ids=None,
                  cmap="Set3", interpolation='none', **kwargs):
    """Genotype-barcode matrix plot for GTbarcode
    (base_plot.py:117-146)."""
    import matplotlib.pyplot as plt

    mat = np.zeros((len(barcode_set[0][1:]), len(barcode_set)))
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            mat[i, j] = float(barcode_set[j][i + 1])

    im = plt.imshow(mat, cmap=cmap, interpolation=interpolation, **kwargs)
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            plt.text(j, i, int(mat[i, j]), ha="center", va="center",
                     color="k")

    if var_ids is None:
        var_ids = range(mat.shape[0])
    plt.yticks(range(len(var_ids)), var_ids)
    plt.ylim(-0.5, len(var_ids) - 0.5)

    if sample_ids is None:
        sample_ids = ["%s\nS%d" % (barcode_set[x], x)
                      for x in range(mat.shape[1])]
    else:
        sample_ids = ["%s\n%s" % (barcode_set[x], sample_ids[x])
                      for x in range(mat.shape[1])]
    plt.xticks(range(len(sample_ids)), sample_ids)
    plt.xlim(-0.5, len(sample_ids) - 0.5)
    return im


def anno_heat(X, row_anno=None, col_anno=None, row_order_ids=None,
              col_order_ids=None, xticklabels=False, yticklabels=False,
              row_cluster=False, col_cluster=False, **kwargs):
    """Annotation-ordered clustermap (base_plot.py:149-218)."""
    import seaborn as sns

    X = np.asarray(X)
    if row_anno is not None:
        if row_order_ids is None:
            row_order_ids = list(np.unique(row_anno))
        else:
            row_order_ids = [x for x in row_order_ids]
        row_num = np.array([row_order_ids.index(x) for x in row_anno])
        idx_row = np.argsort(row_num * 2 ** X.shape[1])
        row_colors = vireo_colors[row_num][idx_row]
    else:
        row_colors = None
        row_order_ids = []
        idx_row = np.arange(X.shape[0])

    if col_anno is not None:
        if col_order_ids is None:
            col_order_ids = list(np.unique(col_anno))
        else:
            col_order_ids = [x for x in col_order_ids]
        col_num = np.array([col_order_ids.index(x) for x in col_anno])
        idx_col = np.argsort(col_num * 2 ** X.shape[0])
        col_colors = vireo_colors[col_num][idx_col]
    else:
        col_colors = None
        col_order_ids = []
        idx_col = np.arange(X.shape[1])

    g = sns.clustermap(X[idx_row, :][:, idx_col],
                       row_colors=row_colors, col_colors=col_colors,
                       col_cluster=col_cluster, row_cluster=row_cluster,
                       xticklabels=xticklabels, yticklabels=yticklabels,
                       **kwargs)

    if row_anno is not None:
        for i in range(len(row_order_ids)):
            g.ax_row_dendrogram.bar(0, 0, color=vireo_colors[i],
                                    label=row_order_ids[i], linewidth=0)
        g.ax_row_dendrogram.legend(loc="center", ncol=1, title="")

    if col_anno is not None:
        for i in range(len(col_order_ids)):
            g.ax_col_dendrogram.bar(0, 0, color=vireo_colors[i],
                                    label=col_order_ids[i], linewidth=0)
        g.ax_col_dendrogram.legend(loc="center", ncol=6, title="")

    g.cax.set_position([1.01, .2, .03, .45])
    return g
