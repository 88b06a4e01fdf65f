// Pure tap->pixels render math, extracted from nodes.js so it is testable
// without a DOM (same pattern as partition.js: the logic lives here, the
// canvas/DOM plumbing stays in the node classes).
//
// Cross-language contract: interactive_vit_tpu/wire/render.py is a
// line-by-line Python transliteration of this module; the committed
// fixtures (tests/fixtures/render_fixtures.json) pin both sides to the
// same expected u8 buffers. render.test.mjs replays them here whenever a
// JS runtime exists; the Python replay runs in CI always.
//
// Semantics preserved from the reference's viewer merge kernel
// (/root/reference/main/static/main/nodes/img_view_node.js:6-33 —
// per-channel accumulate into packed RGBA with clamp) re-expressed as
// canvas ImageData math; the attention/overlay views are additions with
// no reference analog.
//
// Tensor convention: {dims: number[], data: Float32Array} (wire.js).
// All functions return raw Uint8ClampedArray RGBA buffers (the exact
// bytes a caller puts into ImageData), never touching the DOM.

/** Min-max normalize to u8 (Uint8ClampedArray: clamp + round-half-even). */
export function normToU8(data, lo = null, hi = null) {
	let mn = lo;
	let mx = hi;
	if (mn === null || mx === null) {
		mn = Infinity;
		mx = -Infinity;
		for (const v of data) {
			if (v < mn) mn = v;
			if (v > mx) mx = v;
		}
	}
	const span = mx - mn || 1;
	const out = new Uint8ClampedArray(data.length);
	for (let i = 0; i < data.length; i++) out[i] = ((data[i] - mn) / span) * 255;
	return out;
}

/** CHW [3,H,W] / [1,H,W] / [2,H,W] / [H,W] tensor -> {w, h, rgba}.
 * Joint normalization over ALL channels (one normToU8 of the whole
 * tensor); c<3 renders grayscale from channel 0. Null when unrenderable. */
export function tensorRGBA(t) {
	let c = 1;
	let h;
	let w;
	if (t.dims.length === 3) [c, h, w] = t.dims;
	else if (t.dims.length === 2) [h, w] = t.dims;
	else return null;
	const plane = h * w;
	const norm = normToU8(t.data);
	const rgba = new Uint8ClampedArray(4 * plane);
	for (let i = 0; i < plane; i++) {
		rgba[4 * i] = norm[i];
		rgba[4 * i + 1] = norm[c >= 3 ? plane + i : i];
		rgba[4 * i + 2] = norm[c >= 3 ? 2 * plane + i : i];
		rgba[4 * i + 3] = 255;
	}
	return { w, h, rgba };
}

/** ImgView R/G/B channel compositing: up to three [H,W] tensors (null =
 * channel absent = 0), each normalized INDEPENDENTLY, packed into RGBA.
 * Mirrors the reference merge kernel's per-channel accumulate
 * (img_view_node.js:6-33). Null when no channel is present. */
export function channelsRGBA(chans) {
	const present = chans.filter(Boolean);
	if (!present.length) return null;
	const [h, w] = present[0].dims;
	const rgba = new Uint8ClampedArray(4 * h * w);
	chans.forEach((t, ci) => {
		if (!t) return;
		const norm = normToU8(t.data);
		for (let i = 0; i < h * w; i++) rgba[4 * i + ci] = norm[i];
	});
	for (let i = 0; i < h * w; i++) rgba[4 * i + 3] = 255;
	return { w, h, rgba };
}

/** Normalize an attention tap to [H,N,N]: [B,H,N,N] takes the first
 * sample; [H,N,N] passes through; anything else -> null. */
export function attnMaps(t) {
	if (!t) return null;
	let dims = t.dims;
	let data = t.data;
	if (dims.length === 4) {
		data = data.subarray(0, dims[1] * dims[2] * dims[3]);
		dims = [dims[1], dims[2], dims[3]];
	}
	return dims.length === 3 ? { dims, data } : null;
}

/** Head-grid layout: column count of the thumbnail grid for H heads. */
export function headGridCols(numHeads) {
	return Math.ceil(Math.sqrt(numHeads));
}

/** One head's [N,N] map out of normalized maps m ([H,N,N]). */
export function headMap(m, head) {
	const [H, N] = m.dims;
	const h = Math.min(head, H - 1);
	return { dims: [N, N], data: m.data.subarray(h * N * N, (h + 1) * N * N) };
}

/** One query row as a spatial grid, CLS column skipped: row q of an
 * [N,N] map -> [side,side] with side = floor(sqrt(N-1)) (196 -> 14x14).
 * Null when too small to render. */
export function queryRowGrid(map, N, q) {
	const qq = Math.min(q, N - 1);
	const row = map.subarray(qq * N + 1, (qq + 1) * N);
	const side = Math.floor(Math.sqrt(row.length));
	if (side <= 1) return null;
	return { dims: [side, side], data: row.subarray(0, side * side) };
}

/** Attention/rollout heat composited onto a CHW image: query row (CLS
 * column skipped) bilinearly upsampled to the image size and
 * alpha-blended as a red->yellow ramp. `t` may be [N,N], [B,N,N] or
 * [B,H,N,N] (leading axes collapse to the first sample/head).
 * Returns {w, h, rgba} or null when inputs are unrenderable. */
export function overlayRGBA(img, t, query, alpha) {
	if (!img || !t) return null;
	if (img.dims.length !== 3) return null;
	const [c, h, w] = img.dims;
	let dims = t.dims;
	let data = t.data;
	while (dims.length > 2) {
		const tail = dims.slice(1).reduce((x, y) => x * y, 1);
		data = data.subarray(0, tail);
		dims = dims.slice(1);
	}
	if (dims.length !== 2 || dims[0] !== dims[1]) return null;
	const n = dims[0];
	const q = Math.min(query, n - 1);
	const row = data.subarray(q * n + 1, (q + 1) * n);
	const side = Math.floor(Math.sqrt(row.length));
	if (side < 2) return null;
	const heat = normToU8(row.subarray(0, side * side));
	const plane = h * w;
	const norm = normToU8(img.data);
	const out = new Uint8ClampedArray(4 * plane);
	const sy = (side - 1) / Math.max(1, h - 1);
	const sx = (side - 1) / Math.max(1, w - 1);
	for (let y = 0; y < h; y++) {
		const fy = y * sy;
		const y0 = Math.floor(fy);
		const y1 = Math.min(side - 1, y0 + 1);
		const wy = fy - y0;
		for (let x = 0; x < w; x++) {
			const fx = x * sx;
			const x0 = Math.floor(fx);
			const x1 = Math.min(side - 1, x0 + 1);
			const wx = fx - x0;
			const hv =
				((heat[y0 * side + x0] * (1 - wx) + heat[y0 * side + x1] * wx) *
					(1 - wy) +
					(heat[y1 * side + x0] * (1 - wx) + heat[y1 * side + x1] * wx) *
						wy) /
				255;
			const a = alpha * hv;
			// red→yellow ramp
			const hr = 255;
			const hg = Math.max(0, 2 * hv - 1) * 255;
			const i = y * w + x;
			const r = norm[i];
			const g = norm[c >= 3 ? plane + i : i];
			const b = norm[c >= 3 ? 2 * plane + i : i];
			out[4 * i] = r * (1 - a) + hr * a;
			out[4 * i + 1] = g * (1 - a) + hg * a;
			out[4 * i + 2] = b * (1 - a) + 0;
			out[4 * i + 3] = 255;
		}
	}
	return { w, h, rgba: out };
}
