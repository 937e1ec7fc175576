/* Test-only JPEG decode oracle against the SYSTEM libjpeg (the same
 * library PIL wraps behind the reference's display.py). Reads a JPEG
 * file, writes "w h ncomp\n" then the raw interleaved samples libjpeg
 * produces with its default out_color_space (gray -> gray, YCbCr ->
 * RGB, CMYK/YCCK -> JCS_CMYK, i.e. the *stored-convention* channels
 * BEFORE the consumer-side Adobe inversion). Compiled on demand by
 * tests/test_jpeg_libjpeg_oracle.py; skipped when cc/libjpeg are absent.
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
#include <setjmp.h>

struct err_mgr { struct jpeg_error_mgr pub; jmp_buf jb; };

static void err_exit(j_common_ptr cinfo) {
    struct err_mgr *e = (struct err_mgr *)cinfo->err;
    longjmp(e->jb, 1);
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: jpeg_oracle FILE\n"); return 2; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 2; }
    struct jpeg_decompress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jb)) { fprintf(stderr, "libjpeg error\n"); return 3; }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height,
        n = cinfo.output_components;
    printf("%d %d %d\n", w, h, n);
    fflush(stdout);
    JSAMPARRAY buf = (*cinfo.mem->alloc_sarray)(
        (j_common_ptr)&cinfo, JPOOL_IMAGE, w * n, 1);
    while (cinfo.output_scanline < cinfo.output_height) {
        jpeg_read_scanlines(&cinfo, buf, 1);
        fwrite(buf[0], 1, (size_t)w * n, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}
